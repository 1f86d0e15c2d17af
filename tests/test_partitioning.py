"""Deterministic shuffle-key placement (index/partitioning.py).

The even_salted_repartition contract only holds if the driver-side Murmur3
replica agrees with Spark's HashPartitioning hash — these tests pin that
agreement and the resulting placement/balance properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.partitioning import (
    even_salted_repartition,
    murmur3_hash_int,
    pid_lut,
)


def test_murmur3_matches_spark_hash(spark):
    vals = list(range(0, 200)) + [-1, -17, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in vals], "x int").select(
        "x", F.hash("x").alias("h")
    )
    got = {r["x"]: r["h"] for r in df.collect()}
    for v in vals:
        assert murmur3_hash_int(v) == got[v], v


@pytest.mark.parametrize("n", [7, 32, 64])
def test_pid_lut_inverts_partitioning(n):
    lut = pid_lut(n)
    assert len(lut) == n
    for t, pid in enumerate(lut):
        assert murmur3_hash_int(pid) % n == t


def test_even_salted_repartition_placement(spark):
    n_parts, n_salt = 16, 3
    rows = [(p, s, p * 100 + s) for p in range(33) for s in range(n_salt)]
    df = spark.createDataFrame(rows, "phash int, salt int, payload int")
    out = even_salted_repartition(df, n_parts, n_salt).withColumn(
        "pid", F.spark_partition_id()
    )
    got = {(r["phash"], r["salt"]): r["pid"] for r in out.collect()}
    # every key landed on its designated slot
    for (p, s), pid in got.items():
        assert pid == (p * n_salt + s) % n_parts
    # ... and the routing column was dropped
    assert out.columns == ["phash", "salt", "payload", "pid"]
    # key count per partition is floor/ceil(99/16) = 6..7: no empty task,
    # no collision pile-up
    from collections import Counter

    per_part = Counter(got.values())
    assert len(per_part) == n_parts
    assert min(per_part.values()) >= len(rows) // n_parts
    assert max(per_part.values()) <= len(rows) // n_parts + 1
