"""IVF-Flat approximate nearest-neighbor search over the `embeddings` table.

The LSH family (similarity.py) buckets by random hyperplanes; IVF is the
other standard scale shape: a small coarse quantizer (C centroids) splits
the corpus into C inverted lists, a query probes only its `nprobe` nearest
lists, and list members are scored exactly.  Scan cost drops by a factor of
C/nprobe, and — unlike LSH — the lists are *data-adaptive*, so recall holds
on clustered corpora where fixed hyperplanes shear clusters apart.

Scale shape (10^12 rows): the coarse quantizer is a small trained artifact
(here: the C lowest-vec_id vectors, a deterministic stand-in for k-means —
real IVF trains centroids offline on a sample, exactly this size); it lives
as plan-time literals, so list assignment is ONE shuffle-free projection
(an array-of-structs max over C inline cosines, pure codegen — no window,
no groupBy, no UDF).  Lists are persisted `partitionBy(list_id)`
(`write_ivf_index`), so a probe is directory pruning: the scan plans only
`nprobe` of C partitions.  See test_ivf.py for the pruning witness.

Determinism contract: every cosine folds sequentially in component order
(F.aggregate on Spark, list_dot_product in DuckDB — verified bit-identical
by the ann_bruteforce gate); assignment ties break on the smaller centroid
id, rank ties on the smaller vec_id, so the DuckDB oracle reproduces the
probed row set and scores exactly (hash-checked, not rows-only).

Reference parity: the reference has no vector search; this extends the
index-probe idiom (XdiReportReducer.java's generation-ordered searcher
walk) to embedding columns, as SURVEY §2's training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.operators.parity import load
from lucene_mapreduce_spark.operators.similarity import QUERY_VEC_ID, _cosine

N_CENTROIDS = 16  # deterministic coarse quantizer: vec_id 1..N_CENTROIDS
N_PROBE = 4  # lists probed per query


def _cosine_guarded(a: Column, b: Column) -> Column:
    """Sequential-fold cosine; -2.0 (below any real cosine) for zero-norm
    inputs so degenerate vectors sort last instead of producing NaN."""
    na2 = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb2 = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return F.when((na2 == 0) | (nb2 == 0), F.lit(-2.0)).otherwise(_cosine(a, b))


def _centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """The coarse quantizer: [(cid, vector)] for vec_id 1..N_CENTROIDS.
    C rows of metadata scale — the standard IVF artifact that rides the
    driver/closure, like a trained k-means codebook."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").between(1, N_CENTROIDS))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return sorted((int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows)


def _assign_col(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """list_id = argmax-cosine centroid (ties -> smaller cid), as one
    shuffle-free expression: array_max over struct(cosine, -cid) — struct
    ordering is lexicographic, so max picks highest cosine then lowest cid."""
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _cosine_guarded(
                        vec, F.array(*[F.lit(x) for x in cvec])
                    ).alias("c"),
                    F.lit(-cid).alias("neg_cid"),
                )
                for cid, cvec in centroids
            ]
        )
    )
    return -best["neg_cid"]


def assign_lists(
    spark: SparkSession,
    sf_dir: str,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """(vec_id, embedding, list_id): every vector tagged with its inverted
    list.  One projection over the scan — zero shuffles.  Pass a trained
    quantizer from train_centroids to override the static one."""
    emb = load(spark, sf_dir, "embeddings")
    cents = centroids if centroids is not None else _centroids(spark, sf_dir)
    return emb.select(
        "vec_id",
        "embedding",
        _assign_col(F.col("embedding").cast("array<double>"), cents).alias("list_id"),
    )


def train_centroids(
    spark: SparkSession,
    sf_dir: str,
    iters: int = 5,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (Lloyd's) refinement of the coarse quantizer.

    Init = the static quantizer (lowest-vec_id vectors), unit-normalized;
    each iteration is ONE scan with the shuffle-free argmax assignment plus
    one C×dim-cell mean aggregation (posexplode -> groupBy(list, pos) ->
    avg, map-side combinable — C*dim rows reach the driver, never vectors).
    Empty lists keep their previous centroid.  At 10^12 rows you train on a
    bounded sample (the standard IVF recipe) — same code, sampled input.

    Trained centroids raise recall on clustered corpora (asserted in
    tests); they are NOT hash-gate material — distributed float means are
    reduction-order dependent at the ulp level, unlike the static
    quantizer's exact md5-free determinism.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norm2 = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda s, x: s + x
    )
    unit = emb.select(
        "vec_id",
        F.when(norm2 == 0, F.col("v"))
        .otherwise(F.transform("v", lambda x: x / F.sqrt(norm2)))
        .alias("v"),
    )

    init = _centroids(spark, sf_dir)
    cids = [cid for cid, _ in init]
    mat: dict[int, np.ndarray] = {}
    for cid, vec in init:
        a = np.asarray(vec, np.float64)
        n = np.linalg.norm(a)
        mat[cid] = a / n if n > 0 else a
    dim = len(init[0][1])

    for _ in range(iters):
        cents = [(cid, [float(x) for x in mat[cid]]) for cid in cids]
        assign = unit.select(
            "v", _assign_col(F.col("v"), cents).alias("list_id")
        )
        cells = (
            assign.select("list_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {cid: np.zeros(dim) for cid in cids}
        for r in cells:
            new[int(r["list_id"])][int(r["pos"])] = r["m"]
        for cid in cids:
            n = np.linalg.norm(new[cid])
            if n > 0:
                mat[cid] = new[cid] / n
    return [(cid, [float(x) for x in mat[cid]]) for cid in cids]


def write_ivf_index(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Persist the inverted lists partitioned by list_id: a probe becomes
    directory pruning (scan reads nprobe of N_CENTROIDS partitions)."""
    assign_lists(spark, sf_dir).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(out_dir)


def _probe_lists(
    qvec: list[float], centroids: list[tuple[int, list[float]]], nprobe: int
) -> list[int]:
    """The nprobe centroid ids nearest the query, by the same sequential
    left-fold cosine both engines use (ties -> smaller cid)."""

    def fold_dot(a: list[float], b: list[float]) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s = s + x * y
        return s

    scored = []
    for cid, cvec in centroids:
        nq, nc = fold_dot(qvec, qvec) ** 0.5, fold_dot(cvec, cvec) ** 0.5
        cos = -2.0 if nq * nc == 0 else fold_dot(qvec, cvec) / (nq * nc)
        scored.append((-cos, cid))
    return [cid for _, cid in sorted(scored)[:nprobe]]


def ann_ivf_batch_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    qmod: int | None = None,
    nprobe: int = N_PROBE,
    lists_df: DataFrame | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Batch IVF probing: top-k for every query of a probe batch through
    the inverted lists. Per-query probe sets are computed driver-side
    against the (tiny) centroid table — Lucene-style query rewriting —
    and shipped as a broadcast (query_id, list_id, qvec) frame; the join
    on list_id prunes the scan to the union of probed partitions, and
    each (query, vector) pair scores at most once (a vector lives in
    exactly one list). Per-query ranking is a WindowGroupLimit window."""
    from lucene_mapreduce_spark.operators.similarity import ANN_BATCH_MOD

    qmod = ANN_BATCH_MOD if qmod is None else qmod
    cents = centroids if centroids is not None else _centroids(spark, sf_dir)
    qrows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % qmod == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    pairs = []
    for r in qrows:
        qid = int(r["vec_id"])
        qv = [float(x) for x in r["v"]]
        for lid in _probe_lists(qv, cents, nprobe):
            pairs.append((qid, int(lid), qv))
    qdf = spark.createDataFrame(
        pairs, "query_id long, list_id int, qvec array<double>"
    )
    lists = (
        lists_df
        if lists_df is not None
        else assign_lists(spark, sf_dir, centroids=cents)
    )
    scored = (
        lists.join(F.broadcast(qdf), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_guarded(
                    F.col("embedding").cast("array<double>"), F.col("qvec")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    nprobe: int = N_PROBE,
    lists_df: DataFrame | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF probing: score only the vectors
    whose list_id is among the query's nprobe nearest centroids.

    Pass lists_df (e.g. spark.read.parquet on a write_ivf_index output) to
    probe a persisted index — the IN filter on list_id then prunes
    partitions and the scan reads nprobe/N_CENTROIDS of the data.  Without
    it the assignment is computed inline (still one shuffle-free pass).
    """
    cents = centroids if centroids is not None else _centroids(spark, sf_dir)
    qvec = [
        float(x)
        for x in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>"))
        .collect()[0][0]
    ]
    probe = _probe_lists(qvec, cents, nprobe)

    lists = (
        lists_df
        if lists_df is not None
        else assign_lists(spark, sf_dir, centroids=cents)
    )
    qcol = F.array(*[F.lit(x) for x in qvec])
    scored = (
        lists.filter(F.col("list_id").isin(probe))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.round(
                _cosine_guarded(F.col("embedding").cast("array<double>"), qcol), 6
            ).alias("cosine"),
        )
    )
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    return ranked_topk(
        scored, [F.desc("cosine"), F.asc("vec_id")], k
    ).select("vec_id", "cosine", "rank")
