"""Sharded test-suite runner (VERDICT r4 item 8: keep the full suite
re-runnable per session as it grows ~linearly with query batches).

pytest-xdist is not in the container, so this shards test FILES across N
independent pytest processes (each with its own SparkSession; Spark UI is
off and no Hive metastore is used, so processes don't collide). Files are
assigned largest-first onto the currently-lightest shard (LPT heuristic,
file size as the cost proxy — batch test files are near-uniform).

Usage: python tools/run_suite_sharded.py [n_shards]   (default 4)
Exit code 0 iff every shard passed. Logs: /tmp/suite_shard_<i>.log
"""
from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    sizes = {f: os.path.getsize(f) for f in files}
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0] * n
    for f in sorted(files, key=lambda f: -sizes[f]):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += sizes[f]

    env = dict(os.environ)
    # each shard's Spark session gets a fraction of the box; 4 shards x 8
    # threads oversubscribes 32 vCPUs only modestly (tasks are ~2 busy
    # cores each, and shards interleave IO/JVM/python phases)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        log = open(f"/tmp/suite_shard_{i}.log", "w")
        procs.append(
            (
                i,
                log,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", "--tb=short", *shard],
                    cwd=REPO,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    env=env,
                ),
            )
        )
    ok = True
    totals = [0, 0]  # passed, failed
    for i, log, p in procs:
        rc = p.wait()
        log.close()
        tail = open(f"/tmp/suite_shard_{i}.log").read()
        m = re.search(r"(\d+) passed", tail)
        fm = re.search(r"(\d+) failed", tail)
        passed = int(m.group(1)) if m else 0
        failed = int(fm.group(1)) if fm else 0
        totals[0] += passed
        totals[1] += failed
        status = "ok" if rc == 0 else f"EXIT {rc}"
        print(f"shard {i}: {passed} passed, {failed} failed ({status})")
        ok = ok and rc == 0
    dt = time.time() - t0
    print(f"TOTAL: {totals[0]} passed, {totals[1]} failed in {dt/60:.1f} min "
          f"across {n} shards")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
