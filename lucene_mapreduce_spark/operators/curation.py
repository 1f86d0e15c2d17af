"""Training-data curation composites: near-dup clustering + filter pipeline.

Connected components turns pairwise near-dup evidence (minhash LSH pairs)
into canonical-document clusters — the step an LLM-data pipeline actually
acts on (keep one doc per cluster). Implemented as iterative min-label
propagation over DataFrame joins (no GraphFrames dependency):

  label(v) <- min(label(v), min over neighbors label(u))

which converges in O(component diameter) rounds; each round is one
broadcast-or-shuffle join + one aggregation, with localCheckpoint between
rounds to cut lineage growth. At web scale the same loop is run with the
large-star/small-star optimization (Kiveris et al., "Connected Components
in MapReduce and Beyond") — the per-round plan shape here is its
small-star step. The DuckDB oracle replays the exact fixpoint with a
recursive CTE, so the gate row is hash-checked.

The curation pipeline composes the text-analysis + dedup family into the
standard keep/drop decision: language filter -> quality floor -> exact
dedup (min doc_id per md5 text) -> near-dup drop (larger doc_id of each
verified near-dup pair loses). Every stage is an already-oracle-checked
operator; the composition is one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from lucene_mapreduce_spark.operators.parity import load
from lucene_mapreduce_spark.operators.textstats import language_id, quality_score

QUALITY_FLOOR = 0.5


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node in `edges`, where component is the
    minimum node id reachable — deterministic canonical labels."""
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    sym = sym.localCheckpoint()
    for _ in range(max_iter):
        # candidate labels flowing across edges this round
        prop = (
            sym.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # cut lineage per round
        if new_labels.filter(F.col("changed")).limit(1).count() == 0:
            labels = new_labels
            break
        labels = new_labels
    return labels.select("node", F.col("label").alias("component"))


def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: cluster ids over the MinHash-LSH near-dup graph.
    (doc_id, component) for every doc in at least one candidate pair;
    component = min doc_id in the cluster."""
    edges = minhash_lsh_pairs(spark, sf_dir)
    return connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )


def curation_pipeline(
    spark: SparkSession, sf_dir: str, quality_floor: float = QUALITY_FLOOR
) -> DataFrame:
    """Gate entry: the end-to-end keep/drop decision per document.

    keep iff: predicted language is 'en'
          AND quality >= quality_floor
          AND doc is the exact-dedup keeper (min doc_id per md5(text))
          AND doc is not the larger side of any verified near-dup pair
              (3-gram Jaccard >= 0.5)
    Returns every doc with its per-stage flags + final `kept` — the audit
    shape a curation run reports, not just the survivor list.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    lang = language_id(spark, sf_dir).select("doc_id", "pred_lang")
    qual = quality_score(spark, sf_dir).select("doc_id", "quality")
    keepers = exact_dedup(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id"), F.lit(True).alias("is_keeper")
    )
    dup_losers = (
        ngram_jaccard_pairs(spark, sf_dir, threshold=0.5)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup_loser", F.lit(True))
    )
    out = (
        docs.join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(keepers, "doc_id", "left")
        .join(dup_losers, "doc_id", "left")
        .select(
            "doc_id",
            "pred_lang",
            "quality",
            F.coalesce("is_keeper", F.lit(False)).alias("is_keeper"),
            F.coalesce("is_near_dup_loser", F.lit(False)).alias("near_dup_loser"),
        )
    )
    return out.withColumn(
        "kept",
        (F.col("pred_lang") == "en")
        & (F.col("quality") >= F.lit(quality_floor))
        & F.col("is_keeper")
        & ~F.col("near_dup_loser"),
    )
