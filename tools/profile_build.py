"""Phase-level profile of one index build at a given core count.

Replicates bench.py's _timed_build leg but times the phases inside
build_segment separately: the Spark encode->shuffle->merge->write job,
driver-side segment_stats, and manifest commit. Used to locate the fixed
(non-parallelizing) cost that caps N-vs-4N scaling efficiency.

Usage: python tools/profile_build.py [cpus] [n_conv] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_CONV = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from lucene_mapreduce_spark.session import get_spark
    from lucene_mapreduce_spark.datagen.transcripts import (
        transcripts_df_distributed,
        with_docid,
    )
    from lucene_mapreduce_spark.index import build as bmod
    from lucene_mapreduce_spark.index.build import build_segment

    work = tempfile.mkdtemp(prefix="lmr_prof_", dir="/dev/shm")
    extra = {
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }
    local = "/dev/shm/lmr_bench_local"
    os.makedirs(local, exist_ok=True)
    extra["spark.local.dir"] = local

    # corpus written once at full parallelism (same as bench.py)
    spark = get_spark("prof_gen", cpus=16, shuffle_partitions=32, extra_conf=extra)
    corpus_path = os.path.join(work, "corpus")
    with_docid(
        transcripts_df_distributed(spark, n_conv=N_CONV, seed=42, partitions=64)
    ).select("doc_id", "text").write.mode("overwrite").parquet(corpus_path)
    spark.stop()

    import duckdb

    lo, hi = duckdb.sql(
        f"SELECT min(doc_id), max(doc_id) FROM read_parquet('{corpus_path}/*.parquet')"
    ).fetchone()
    span = max(int(hi) - int(lo) + 1, 1)
    chunk_docs = max(span // 128, 1 << 12)

    spark = get_spark(
        f"prof_{CPUS}", cpus=CPUS, shuffle_partitions=2 * CPUS, extra_conf=extra
    )
    corpus = spark.read.parquet(corpus_path)
    corpus.count()

    # monkeypatch segment_stats + commit to time them
    phases: dict[str, list[float]] = {"stats": [], "commit": [], "job": [], "total": []}
    real_stats = bmod.segment_stats
    real_commit = bmod.commit_manifest

    def timed_stats(*a, **k):
        t0 = time.perf_counter()
        r = real_stats(*a, **k)
        phases["stats"].append(time.perf_counter() - t0)
        return r

    def timed_commit(*a, **k):
        t0 = time.perf_counter()
        r = real_commit(*a, **k)
        phases["commit"].append(time.perf_counter() - t0)
        return r

    bmod.segment_stats = timed_stats
    bmod.commit_manifest = timed_commit

    # warm build (same as bench)
    warm = corpus.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    build_segment(spark, warm, os.path.join(work, "warm"), num_partitions=32,
                  chunk_docs=chunk_docs)
    for k in phases:
        phases[k].clear()

    import gc

    for r in range(REPS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        tgt = os.path.join(work, f"ix_{r}")
        t0 = time.perf_counter()
        build_segment(spark, corpus, tgt, num_partitions=32, chunk_docs=chunk_docs)
        total = time.perf_counter() - t0
        phases["total"].append(total)
        phases["job"].append(total - phases["stats"][-1] - phases["commit"][-1])
        shutil.rmtree(tgt, ignore_errors=True)

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    out = {k: [round(x, 3) for x in v] for k, v in phases.items()}
    out["cpus"] = CPUS
    out["n_conv"] = N_CONV
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
