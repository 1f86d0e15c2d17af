"""Training-data curation composites: near-dup clustering + filter pipeline.

Connected components turns pairwise near-dup evidence (minhash LSH pairs)
into canonical-document clusters — the step an LLM-data pipeline actually
acts on (keep one doc per cluster). Implemented with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", 2014 — public):

  large-star(u): connect every neighbor v > u to m = min(N⁺(u))
  small-star(u): connect every neighbor (all < u) and u itself to m

which contracts each component to a star around its minimum node in
O(log² n) rounds — a 10^9-edge near-dup graph with long chains converges
in tens of rounds where min-label propagation needs O(diameter). Each
round is two map-side-combinable groupBys + joins over the edge frame,
localCheckpoint'ed to cut lineage. The DuckDB oracle replays the exact
fixpoint with a recursive CTE, so the gate row is hash-checked.

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


def _star_rounds(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star contraction. ``edges`` must be
    canonical (u > v) distinct pairs. Returns (star edges (u, v) with v =
    the component minimum for every non-root u, rounds used)."""
    e = edges.localCheckpoint()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over the symmetrized view: m = min(N⁺(u)); every
        # neighbor v > u re-attaches to m
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: every edge now points big -> small; neighbors (and u)
        # re-attach to m = min(N(u))
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(mins2, "u")
        small = (
            joined.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
        )
        small = small.localCheckpoint()
        changed = (
            small.exceptAll(e).limit(1).count() > 0
            or e.exceptAll(small).limit(1).count() > 0
        )
        e = small
        if not changed:
            break
    return e, rounds


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node in `edges`, where component is the
    minimum node id reachable — deterministic canonical labels."""
    canon = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    stars, _ = _star_rounds(canon, max_iter)
    # at convergence every component is a star around its min node:
    # non-roots carry a (u -> min) edge; roots (and self-loop-only nodes)
    # label themselves
    labels = stars.select(F.col("u").alias("node"), F.col("v").alias("label"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", "node").alias("component")
    )


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


def cluster_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster, the kept representative: the longest member
    (max token count, ties to the smallest doc_id) — the "keep best, drop
    the rest" step a curation pipeline runs after clustering (the
    complement of curation_pipeline's drop-larger rule, at cluster rather
    than pair granularity). One docid-keyed join (components x doclens)
    and one map-side-combinable groupBy with an argmax struct — no
    per-cluster window, so a 10^9-doc cluster set never sorts."""
    from lucene_mapreduce_spark.query.bm25_df import corpus_postings

    comp = near_dup_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    _, doclens = corpus_postings(docs)
    j = comp.join(doclens, "doc_id")
    agg = j.groupBy("component").agg(
        F.max(
            F.struct(F.col("dl").alias("dl"), (-F.col("doc_id")).alias("nd"))
        ).alias("s"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return agg.select(
        "component",
        (-F.col("s.nd")).cast("long").alias("kept_doc_id"),
        F.col("s.dl").cast("long").alias("kept_dl"),
        F.col("n_members").cast("long").alias("n_members"),
    ).orderBy("component")


def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how many clusters of each size the
    MinHash-LSH component pass found — the dedup-health report a curation
    run publishes (a heavy tail of giant clusters means boilerplate or a
    degenerate shingle space; the histogram is the first thing to read
    before trusting a dedup rate). Two map-side-combinable groupBys over
    the component output — cluster count, then size histogram; both keyed
    on bounded cardinalities."""
    comp = near_dup_components(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .orderBy("size")
    )


def near_dup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the MinHash-LSH candidate graph — the
    skew diagnostic BEFORE running connected components (a node with
    degree 10^4 is a boilerplate hub that will glue the component pass
    into one giant cluster; dup_cluster_size_histogram reads the damage
    after, this reads it before). Edges count once per unordered pair;
    degree sums both endpoints; two bounded groupBys."""
    edges = minhash_lsh_pairs(spark, sf_dir)
    nodes = edges.select(F.col("doc_a").alias("doc_id")).unionAll(
        edges.select(F.col("doc_b").alias("doc_id"))
    )
    deg = nodes.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("degree")
    )


def dup_cluster_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix histogram over near-dup clusters — the cross-source
    contamination view of the dedup graph (a cluster spanning many
    sources means the same text is syndicated across crawls; the pairwise
    face is near_dup_leakage_matrix, this is the cluster-level rollup):
    per connected component, count members and distinct sources, then
    histogram clusters by source count. Components come from the
    large-star/small-star MinHash-LSH graph; everything after is two
    bounded groupBys."""
    comp = near_dup_components(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    per = (
        comp.join(docs, "doc_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
    )
    return (
        per.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_members").cast("long").alias("n_docs"),
        )
        .orderBy("n_sources")
    )


# ------------------------------------------------------- batch 59
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source filter-funnel survival counts — the chart every corpus
    curation run publishes (how many docs each cascade stage keeps, per
    source): stage order pinned to curation_pipeline's keep rule —
    (1) predicted language 'en', (2) + quality >= floor, (3) + exact-dup
    keeper, (4) + not a near-dup loser (== `kept`). Counts are cumulative
    ANDs of the per-doc flags curation_pipeline already computes, so the
    funnel is one extra groupBy over that audit frame joined to the
    source column — all exact integers, no new shuffle shape."""
    flags = curation_pipeline(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    f = flags.join(src, "doc_id")
    s1 = F.col("pred_lang") == "en"
    s2 = s1 & (F.col("quality") >= F.lit(QUALITY_FLOOR))
    s3 = s2 & F.col("is_keeper")
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(s1.cast("int")).cast("long").alias("n_lang"),
            F.sum(s2.cast("int")).cast("long").alias("n_quality"),
            F.sum(s3.cast("int")).cast("long").alias("n_dedup"),
            F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )
