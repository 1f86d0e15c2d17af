"""Experiment: score_and_topk variants on a bench-shaped index.

Variants (all compute the identical exact result):
  V0 current: persist(scored) + persist(approx), cand joins approx
  V1 r5 shape: persist(scored) only, ranked window reused
  V2 no persist: kth pass, cand pass, rescore pass (3 computes)
  V4 no persist + doc-prefilter rescore: kth collect -> cand pass ->
     rescore pass where decoded postings semi-join cand docs first
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

CPUS = 16
N_CONV = 250_000

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.query import segments as seg
from lucene_mapreduce_spark.query.bm25_df import _contrib_frame, score_and_topk
from lucene_mapreduce_spark.session import get_spark

BENCH_QUERIES = [
    "tok00000 tok00001",
    "tok00002 tok00010 tok00100",
    "tok00005 tok01500",
    "tok00000 tok00001 tok00002 tok00004 tok00010",
    "tok00042",
]

work = tempfile.mkdtemp(prefix="lmr_exp_", dir="/dev/shm")
extra = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    "spark.local.dir": "/dev/shm/lmr_bench_local",
}
os.makedirs("/dev/shm/lmr_bench_local", exist_ok=True)
spark = get_spark("exp_topk", cpus=CPUS, shuffle_partitions=2 * CPUS, extra_conf=extra)

from lucene_mapreduce_spark.datagen.transcripts import (
    transcripts_df_distributed,
    with_docid,
)

corpus_path = os.path.join(work, "corpus")
(
    with_docid(transcripts_df_distributed(spark, n_conv=N_CONV, seed=42, partitions=64))
    .select("doc_id", "text")
    .write.mode("overwrite")
    .parquet(corpus_path)
)
import duckdb

lo, hi = duckdb.sql(
    f"SELECT min(doc_id), max(doc_id) FROM read_parquet('{corpus_path}/*.parquet')"
).fetchone()
chunk_docs = max((int(hi) - int(lo) + 1) // 128, 1 << 12)
corpus = spark.read.parquet(corpus_path)
ix = os.path.join(work, "ix")
build_segment(spark, corpus, ix, num_partitions=32, chunk_docs=chunk_docs)
m = load_manifest(ix)

qdf = spark.createDataFrame(
    [(f"q{i}", q) for i, q in enumerate(BENCH_QUERIES)],
    "query_id string, query_text string",
)
qbig = spark.range(10000).selectExpr(
    "concat('q', id) AS query_id",
    "concat('tok', lpad(cast(500 + id % 1500 AS string), 5, '0'), ' ', "
    "'tok', lpad(cast(500 + (id * 7) % 1500 AS string), 5, '0')) AS query_text",
)

EPS = 1e-9


def canonical_agg(df):
    return df.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )


def final_rank(per_doc, k):
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def v2(queries, k=10):
    matched = seg._matched_frame(spark, ix, queries, 256, manifest=m)
    scored = _contrib_frame(matched)
    w_ap = Window.partitionBy("query_id").orderBy(F.col("s_ap").desc(), F.col("doc_id").asc())

    def approx():
        return scored.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("s_ap"))

    kth = (
        approx().withColumn("rn", F.row_number().over(w_ap))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("s_ap").alias("kth_s"))
    )
    cand = (
        approx().join(F.broadcast(kth), "query_id", "left")
        .filter(F.col("kth_s").isNull() | (F.col("s_ap") >= F.col("kth_s") - F.lit(EPS)))
        .select("query_id", "doc_id")
    )
    per_doc = canonical_agg(scored.join(cand, ["query_id", "doc_id"], "left_semi"))
    return final_rank(per_doc, k)


def v4(queries, k=10):
    matched = seg._matched_frame(spark, ix, queries, 256, manifest=m)
    scored = _contrib_frame(matched)
    w_ap = Window.partitionBy("query_id").orderBy(F.col("s_ap").desc(), F.col("doc_id").asc())

    def approx():
        return scored.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("s_ap"))

    kth = (
        approx().withColumn("rn", F.row_number().over(w_ap))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("s_ap").alias("kth_s"))
    )
    cand = (
        approx().join(F.broadcast(kth), "query_id", "left")
        .filter(F.col("kth_s").isNull() | (F.col("s_ap") >= F.col("kth_s") - F.lit(EPS)))
        .select("query_id", "doc_id")
    )
    # doc-prefilter: shrink the recomputed contrib frame to candidate docs
    docs = cand.select("doc_id").distinct()
    pre = scored.join(F.broadcast(docs), "doc_id", "left_semi")
    per_doc = canonical_agg(pre.join(F.broadcast(cand), ["query_id", "doc_id"], "left_semi"))
    return final_rank(per_doc, k)


def timeit(name, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.3f}", flush=True)
    return best


res = {}
sc = spark.sparkContext
# warm once
seg.bm25_index_topk(spark, ix, qdf, k=10).collect()

res["v0_5q"] = timeit("v0_5q", lambda: seg.bm25_index_topk(spark, ix, qdf, k=10).collect())
res["v2_5q"] = timeit("v2_5q", lambda: v2(qdf).collect())
res["v4_5q"] = timeit("v4_5q", lambda: v4(qdf).collect())

# sanity: identical results
a = sorted(map(tuple, seg.bm25_index_topk(spark, ix, qdf, k=10).collect()))
b = sorted(map(tuple, v2(qdf).collect()))
c = sorted(map(tuple, v4(qdf).collect()))
assert a == b == c, "variant results differ!"
print("5q results identical", flush=True)

res["v0_10k"] = timeit("v0_10k", lambda: seg.bm25_index_topk(spark, ix, qbig, k=10).count(), reps=2)
res["v2_10k"] = timeit("v2_10k", lambda: v2(qbig).count(), reps=2)
res["v4_10k"] = timeit("v4_10k", lambda: v4(qbig).count(), reps=2)

a = sorted(map(tuple, seg.bm25_index_topk(spark, ix, qbig, k=10).collect()))
c = sorted(map(tuple, v4(qbig).collect()))
assert a == c, "10k results differ!"
print("10k results identical", flush=True)

print(json.dumps({k: round(v, 3) for k, v in res.items()}))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
