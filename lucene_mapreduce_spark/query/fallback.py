"""Generation-fallback key lookup + hits/misses routing over the index.

The reference's query job probes vendor keys against up to 6 index
generations newest-first inside reducers, writing hits to "result" and
misses to "remain" for the next round (XdiReportDriver.java:319-411,
XdiReportReducer.java:342-400, MultipleOutputs at :44,439-440).

Spark-first this is ONE plan, not 6 sequential jobs: union the generations'
doc tables with their seq tag, take the newest copy per doc (max_by), and
left-join the probes — the remain-chain's 6 shuffles collapse into one.
``lookup_keys`` returns every probe with its serving generation (or a miss
flag); ``write_hits_misses`` materializes the reference's two-sink layout
from a single persisted frame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.manifest import load_manifest, segment_dir


def lookup_keys(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    key_col: str = "doc_id",
    max_generations: int = 6,
) -> DataFrame:
    """J2+W3 — resolve each probe key to the newest index generation holding
    it (searching at most ``max_generations`` newest segments, mirroring
    indexMaxSize=6, XdiReportDriver.java:312).

    Returns (doc_id, hit boolean, gen_seq, dl): misses have hit=false and
    null gen/dl — the 'remain' set is ``.filter(~hit)``.
    """
    m = load_manifest(index_dir)
    assert m is not None, f"no index at {index_dir}"
    gens = sorted(m.ordered(), key=lambda s: -s.max_seq)[:max_generations]

    from lucene_mapreduce_spark.index.build import read_doclens

    docs = None
    for s in gens:
        d = read_doclens(
            spark, segment_dir(index_dir, s.segment_id), m.num_partitions
        ).withColumn("gen_seq", F.lit(s.max_seq))
        docs = d if docs is None else docs.unionByName(d)

    newest = docs.groupBy("doc_id").agg(
        F.max("gen_seq").alias("gen_seq"),
        F.max_by("dl", F.col("gen_seq")).alias("dl"),
    )
    out = probes.select(F.col(key_col).cast("long").alias("doc_id")).distinct().join(
        newest, "doc_id", "left"
    )
    return out.select(
        "doc_id",
        F.col("gen_seq").isNotNull().alias("hit"),
        "gen_seq",
        "dl",
    )


def lookup_join(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    key_col: str = "doc_id",
    max_generations: int = 6,
) -> DataFrame:
    """J1 proper — the payload-enriching index-lookup join: each probe key
    is resolved against the newest generation holding it and enriched with
    the stored document payload (the reference decompresses `mapinfo` on a
    hit, XdiReportReducer.java:369). Requires segments built with
    ``store_fields=True``.

    Returns (doc_id, hit, gen_seq, text) — misses have null text; doc_id
    pushdown prunes docstore row groups (stores are doc_id-range sorted).
    """
    m = load_manifest(index_dir)
    assert m is not None, f"no index at {index_dir}"
    gens = sorted(m.ordered(), key=lambda s: -s.max_seq)[:max_generations]
    assert all(s.has_docstore for s in gens), (
        "lookup_join needs store_fields=True segments (docstore sidecars)"
    )
    stores = None
    for s in gens:
        d = (
            spark.read.parquet(os.path.join(segment_dir(index_dir, s.segment_id), "docstore"))
            .withColumn("gen_seq", F.lit(s.max_seq))
        )
        stores = d if stores is None else stores.unionByName(d)
    newest = stores.groupBy("doc_id").agg(
        F.max("gen_seq").alias("gen_seq"),
        F.max_by("text", F.col("gen_seq")).alias("text"),
    )
    keys = probes.select(F.col(key_col).cast("long").alias("doc_id")).distinct()
    return keys.join(newest, "doc_id", "left").select(
        "doc_id",
        F.col("gen_seq").isNotNull().alias("hit"),
        "gen_seq",
        "text",
    )


def write_hits_misses(
    resolved: DataFrame, out_dir: str
) -> tuple[str, str]:
    """S7 — the reference's MultipleOutputs result/remain sinks
    (XdiReportReducer.java:376-394): one persisted frame, two filtered
    writes — a single upstream computation feeding both sinks."""
    resolved = resolved.persist()
    hits_path = os.path.join(out_dir, "result")
    miss_path = os.path.join(out_dir, "remain")
    resolved.filter(F.col("hit")).write.mode("overwrite").parquet(hits_path)
    resolved.filter(~F.col("hit")).write.mode("overwrite").parquet(miss_path)
    resolved.unpersist()
    return hits_path, miss_path
