"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply per-executor. AQE stays ON for joins/aggregations, but the
index segment layout never relies on AQE-coalesced partitioning — segment
partitioning is an explicit, persisted contract (see index/manifest.py),
mirroring the reference's "reducer count must equal index partition count"
contract (reference: XdiReportDriver.java:76,216-222).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Bounded cache registry: operators that persist an intermediate (reused by
# two plan branches) register it here; older entries are evicted, so a
# long-lived session running thousands of queries never accumulates cached
# partitions (each entry would otherwise live until session end).
_PERSISTED: list[DataFrame] = []


def persist_bounded(df: DataFrame, keep: int = 2) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    while len(_PERSISTED) > keep:
        _PERSISTED.pop(0).unpersist()
    return df


def get_spark(
    app_name: str = "lucene_mapreduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (else all cores). Shuffle
    partitions default to the core count — at 100 TB on a 1000-executor
    cluster this would instead be sized so post-shuffle partitions land
    near 128-256 MB; both are one config away because nothing in the
    engine hard-codes a partition count.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-scale split size: benchmark inputs are a few hundred MB, and
        # the default 128m would hand the scan (and any fused mapInPandas
        # stage) to 1-2 tasks — serializing the whole pipeline. On a real
        # cluster reading 100 TB the partition count is huge either way;
        # override via extra_conf there.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_SPLIT", "8m"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
