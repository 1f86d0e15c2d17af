"""Deterministic even placement of (phash, salt) shuffle keys.

The build/merge/TTL shuffles key on (phash, chunk-salt) so a head term's
chunks spread across tasks (build.py module docstring). Hash-partitioning
those ~(P+1)*n_salt keys into n_parts tasks is a balls-into-bins draw:
measured at the bench shape (99 keys -> 32 tasks), one task received 10.9 MB
while another received zero rows, and the reduce stage's wall time ran ~1.5x
its ideal packing — the single biggest scaling-efficiency loss at high
parallelism, where a straggler in the last wave idles every other core
(event-log analysis, BENCH.md round 4). At 1000 executors the same draw
wastes the same fraction of the whole reduce stage.

Fix: assign each key an explicit target task. Spark's DataFrame API offers
no custom partitioner, but `repartition(n, col)` places a row at
pmod(murmur3(col), n) — deterministic and computable off-line. So we invert
it: for each target t in [0, n) find an int pid with
pmod(murmur3_int(pid, 42), n) == t (a few hundred probes cover every n), and
route key (phash, salt) through slot = (phash * n_salt + salt) mod n via a
literal lookup array. Every task then owns floor/ceil(keys/n) keys — no
collision variance, no empty tasks — while preserving the two layout
invariants: a (phash, chunk) group lands wholly in one task (the streaming
merge kernel's contract), and a task holds only ~keys/n distinct phash
values (bounded output-file count under partitionBy(phash)).

The pid->partition mapping is pinned by Spark's public Murmur3_x86_32
(seed 42), the same function exposed as F.hash — tests assert agreement.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M1 = 0xCC9E2D51
_M2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def murmur3_hash_int(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of one 32-bit int, as Spark's F.hash computes it for
    an IntegerType column (signed result)."""
    k1 = (x & 0xFFFFFFFF) * _M1 & 0xFFFFFFFF
    k1 = _rotl32(k1, 15)
    k1 = k1 * _M2 & 0xFFFFFFFF
    h1 = (seed & 0xFFFFFFFF) ^ k1
    h1 = _rotl32(h1, 13)
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # total byte length
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


@lru_cache(maxsize=32)
def pid_lut(n_parts: int) -> tuple[int, ...]:
    """For each target partition t in [0, n_parts): the smallest non-negative
    int pid with pmod(murmur3_hash_int(pid), n_parts) == t. Driver-side,
    cached; coupon-collector over n_parts targets finishes in O(n log n)
    probes."""
    lut: dict[int, int] = {}
    pid = 0
    while len(lut) < n_parts:
        t = murmur3_hash_int(pid) % n_parts  # python % is already pmod
        if t not in lut:
            lut[t] = pid
        pid += 1
    return tuple(lut[t] for t in range(n_parts))


def salted_plan(parallelism_hint: int, num_partitions: int) -> tuple[int, int]:
    """Pick (n_tasks, n_salt) for a posting shuffle: one task per
    (phash, salt) key. n_salt grows with the session's parallelism hint
    (shuffle partitions), so a 1000-executor cluster gets ~4x-parallelism
    tasks while the single box gets ~99 — and the output file count equals
    the task count (each task holds exactly one key, so partitionBy(phash)
    writes exactly one file per task, the same total as the previous
    ~4-files-per-task layout). One key per task also caps the straggler at
    the largest single key (~max-phash-bytes / n_salt) instead of an
    unlucky multi-key pile-up: measured per-phash bytes spread 7.4x at the
    bench shape, and the reduce wall dropped accordingly (BENCH.md round 4)."""
    n_salt = max(2, (4 * parallelism_hint) // (num_partitions + 1))
    return (num_partitions + 1) * n_salt, n_salt


def even_salted_repartition(df: DataFrame, n_parts: int, n_salt: int) -> DataFrame:
    """Repartition rows carrying (phash, salt) columns into n_parts tasks
    with each (phash, salt) key mapped to exactly one task and the keys
    spread round-robin: slot = (phash * n_salt + salt) mod n_parts. All
    other columns pass through; the routing column is dropped."""
    lut = pid_lut(n_parts)
    slot = F.pmod(
        F.col("phash").cast("int") * F.lit(int(n_salt)) + F.col("salt").cast("int"),
        F.lit(int(n_parts)),
    )
    arr = F.array(*[F.lit(int(p)) for p in lut])
    return (
        df.withColumn("__pid", F.element_at(arr, slot + F.lit(1)))
        .repartition(n_parts, "__pid")
        .drop("__pid")
    )
