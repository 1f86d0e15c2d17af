"""V2 (current, two-exchange phase 1) vs V6 (repartition-by-query single
exchange phase 1) on the 10k-query leg. Interleaved reps, same session."""
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

work = tempfile.mkdtemp(prefix="lmr_exp3_", dir="/dev/shm")
extra = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    "spark.local.dir": "/dev/shm/lmr_bench_local",
}
spark = get_spark("exp_topk3", cpus=16, shuffle_partitions=32, extra_conf=extra)

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


def topk(scored, k=10, by_query=False):
    if by_query:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        scored = scored.repartition(nparts, "query_id")
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
    return final_rank(per_doc, k)


def run(by_query):
    matched = seg._matched_frame(spark, ix, qbig, 256, manifest=m)
    return topk(_contrib_frame(matched), 10, by_query)


# warm
run(False).count()
res = {"v2": [], "v6": []}
for rep in range(3):
    for name, bq in (("v2", False), ("v6", True)):
        t0 = time.perf_counter()
        run(bq).count()
        res[name].append(round(time.perf_counter() - t0, 3))
        print(name, res[name][-1], flush=True)

a = sorted(map(tuple, run(False).collect()))
b = sorted(map(tuple, run(True).collect()))
assert a == b, "results differ!"
print("identical results")
print(json.dumps(res))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
