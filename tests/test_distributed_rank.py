"""distributed_row_number: global ranks without a single-partition window
(ADVICE r4 promotion remedy, applied to weibull_plot_fit /
ppcc_exponential_test)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.operators.parity import distributed_row_number


def test_matches_global_window_on_total_order(spark):
    df = spark.range(0, 5000).select(
        (F.xxhash64(F.col("id").cast("string")) % 100000).alias("v"), "id"
    )
    # total order via (v, id): compare against the single-partition window
    got = (
        distributed_row_number(
            df.select(F.struct("v", "id").alias("k"), "v", "id"), "k", "i"
        )
        .select("v", "id", "i")
        .toPandas()
        .sort_values(["v", "id"])
        .reset_index(drop=True)
    )
    w = Window.orderBy("v", "id")
    exp = (
        df.withColumn("i", F.row_number().over(w))
        .toPandas()
        .sort_values(["v", "id"])
        .reset_index(drop=True)
    )
    assert list(got.i) == list(exp.i)


def test_tie_blocks_are_contiguous_and_complete(spark):
    df = spark.range(0, 3000).select((F.col("id") % 7).alias("v"))
    out = distributed_row_number(df, "v", "i").toPandas()
    assert sorted(out.i) == list(range(1, 3001))  # a permutation of 1..n
    # each tie class owns one contiguous rank block
    lo_hi = out.groupby("v").i.agg(["min", "max", "count"]).sort_values("min")
    prev_end = 0
    for _, row in lo_hi.iterrows():
        assert row["min"] == prev_end + 1
        assert row["max"] - row["min"] + 1 == row["count"]
        prev_end = row["max"]


def test_ntile_matches_global_window(spark):
    """distributed_ntile == F.ntile over the same total order, including
    n % k != 0 (ceil-first bucket distribution) and a desc leg via a
    negated double in the struct key (VERDICT r5 item 6 promotions)."""
    from lucene_mapreduce_spark.operators.parity import distributed_ntile

    df = spark.range(0, 3001).select(
        "id",
        ((F.xxhash64(F.col("id").cast("string")) % 1000) / 1000.0).alias("p"),
    )
    for k in (10, 5, 7, 64):
        keyed = df.withColumn(
            "_ord", F.struct((-F.col("p")).alias("np"), F.col("id").alias("i"))
        )
        got = (
            distributed_ntile(keyed, "_ord", k, "tile")
            .select("id", "tile")
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        w = Window.orderBy(F.col("p").desc(), F.col("id").asc())
        exp = (
            df.withColumn("tile", F.ntile(k).over(w))
            .select("id", "tile")
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert list(got.tile) == list(exp.tile), f"k={k}"


def test_ntile_more_buckets_than_rows(spark):
    from lucene_mapreduce_spark.operators.parity import distributed_ntile

    df = spark.range(0, 6).withColumn("_ord", F.col("id"))
    got = distributed_ntile(df, "_ord", 10, "tile").toPandas().sort_values("id")
    # Spark ntile with n < k: each row is its own bucket 1..n
    assert list(got.tile) == [1, 2, 3, 4, 5, 6]
