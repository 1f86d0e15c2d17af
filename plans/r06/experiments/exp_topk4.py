"""V2 (3 computes) vs V7 (persist approx only) vs V8 (single-pass self-window).
Interleaved reps, results asserted identical."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.query import segments as seg
from lucene_mapreduce_spark.query.bm25_df import _contrib_frame
from lucene_mapreduce_spark.session import get_spark
from lucene_mapreduce_spark.datagen.transcripts import (
    transcripts_df_distributed,
    with_docid,
)

work = tempfile.mkdtemp(prefix="lmr_exp4_", dir="/dev/shm")
extra = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    "spark.local.dir": "/dev/shm/lmr_bench_local",
}
spark = get_spark("exp_topk4", cpus=16, shuffle_partitions=32, extra_conf=extra)

corpus_path = os.path.join(work, "corpus")
(
    with_docid(transcripts_df_distributed(spark, n_conv=250_000, seed=42, partitions=64))
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
    [("q0", "tok00000 tok00001"), ("q1", "tok00002 tok00010 tok00100"),
     ("q2", "tok00005 tok01500"),
     ("q3", "tok00000 tok00001 tok00002 tok00004 tok00010"), ("q4", "tok00042")],
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
    approx = scored.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("s_ap"))
    kth = (
        approx.withColumn("rn", F.row_number().over(w_ap))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("s_ap").alias("kth_s"))
    )
    cand = (
        approx.join(F.broadcast(kth), "query_id", "left")
        .filter(F.col("kth_s").isNull() | (F.col("s_ap") >= F.col("kth_s") - F.lit(EPS)))
        .select("query_id", "doc_id")
    )
    per_doc = canonical_agg(scored.join(cand, ["query_id", "doc_id"], "left_semi"))
    return final_rank(per_doc, k), None


def v7(queries, k=10):
    matched = seg._matched_frame(spark, ix, queries, 256, manifest=m)
    scored = _contrib_frame(matched)
    w_ap = Window.partitionBy("query_id").orderBy(F.col("s_ap").desc(), F.col("doc_id").asc())
    approx = scored.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("s_ap")).persist()
    kth = (
        approx.withColumn("rn", F.row_number().over(w_ap))
        .filter(F.col("rn") == k)
        .select("query_id", F.col("s_ap").alias("kth_s"))
    )
    cand = (
        approx.join(F.broadcast(kth), "query_id", "left")
        .filter(F.col("kth_s").isNull() | (F.col("s_ap") >= F.col("kth_s") - F.lit(EPS)))
        .select("query_id", "doc_id")
    )
    per_doc = canonical_agg(scored.join(cand, ["query_id", "doc_id"], "left_semi"))
    return final_rank(per_doc, k), approx


def v8(queries, k=10):
    matched = seg._matched_frame(spark, ix, queries, 256, manifest=m)
    scored = _contrib_frame(matched)
    w_ap = Window.partitionBy("query_id").orderBy(F.col("s_ap").desc(), F.col("doc_id").asc())
    w_q = Window.partitionBy("query_id")
    approx = scored.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("s_ap"))
    cand = (
        approx.withColumn("rn", F.row_number().over(w_ap))
        .withColumn("kth_s", F.max(F.when(F.col("rn") == k, F.col("s_ap"))).over(w_q))
        .filter(F.col("kth_s").isNull() | (F.col("s_ap") >= F.col("kth_s") - F.lit(EPS)))
        .select("query_id", "doc_id")
    )
    per_doc = canonical_agg(scored.join(cand, ["query_id", "doc_id"], "left_semi"))
    return final_rank(per_doc, k), None


def timed(fn, queries):
    t0 = time.perf_counter()
    df, handle = fn(queries)
    n = df.count()
    dt = time.perf_counter() - t0
    if handle is not None:
        handle.unpersist()
    return round(dt, 3)


# warm
v2(qdf)[0].collect()
res = {}
for leg, q in (("5q", qdf), ("10k", qbig)):
    for name, fn in (("v2", v2), ("v7", v7), ("v8", v8)):
        res.setdefault(f"{name}_{leg}", [])
    for rep in range(3 if leg == "5q" else 2):
        for name, fn in (("v2", v2), ("v7", v7), ("v8", v8)):
            res[f"{name}_{leg}"].append(timed(fn, q))
            print(f"{name}_{leg}", res[f"{name}_{leg}"][-1], flush=True)

a = sorted(map(tuple, v2(qdf)[0].collect()))
for fn in (v7, v8):
    df, h = fn(qdf)
    b = sorted(map(tuple, df.collect()))
    if h is not None: h.unpersist()
    assert a == b, f"{fn.__name__} 5q differ"
a = sorted(map(tuple, v2(qbig)[0].collect()))
for fn in (v7, v8):
    df, h = fn(qbig)
    b = sorted(map(tuple, df.collect()))
    if h is not None: h.unpersist()
    assert a == b, f"{fn.__name__} 10k differ"
print("identical results")
print(json.dumps(res))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
