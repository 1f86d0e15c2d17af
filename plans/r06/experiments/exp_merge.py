"""Decompose merge_once phases on the bench shape."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def idle_frac(secs=3):
    def snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return v[3] + v[4], sum(v)

    i0, t0 = snap()
    time.sleep(secs)
    i1, t1 = snap()
    return (i1 - i0) / (t1 - t0)


print("idle before:", round(idle_frac(), 3), flush=True)

from pyspark.sql import Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.build import build_segment, read_doclens
from lucene_mapreduce_spark.index.manifest import load_manifest, segment_dir
from lucene_mapreduce_spark.index.merge import _dead_markers, _load_doclens, merge_all
from lucene_mapreduce_spark.session import get_spark
from lucene_mapreduce_spark.datagen.transcripts import (
    transcripts_df_distributed,
    with_docid,
)

N_CONV = 250_000
work = tempfile.mkdtemp(prefix="lmr_expm_", dir="/dev/shm")
extra = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    "spark.local.dir": "/dev/shm/lmr_bench_local",
}
spark = get_spark("exp_merge", cpus=16, shuffle_partitions=32, extra_conf=extra)

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
t = {}
t0 = time.perf_counter(); build_segment(spark, corpus, ix, num_partitions=32, chunk_docs=chunk_docs); t["build"] = time.perf_counter() - t0
delta = corpus.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).withColumn(
    "text", F.concat(F.lit("updated "), F.col("text"))
)
t0 = time.perf_counter(); build_segment(spark, delta, ix); t["build_delta"] = time.perf_counter() - t0

m = load_manifest(ix)
metas = m.ordered()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


sc = spark.sparkContext

def leg(name, fn):
    sc.setJobDescription(name)
    t0 = time.perf_counter(); fn(); t[name] = time.perf_counter() - t0
    sc.setJobDescription(None)


doclens = _load_doclens(spark, ix, metas, m.num_partitions)
leg("p1_doclens_decode", lambda: _noop(doclens))
w = Window.partitionBy("doc_id").orderBy(F.col("seg_seq").desc())
ranked = doclens.withColumn("rn", F.row_number().over(w))
leg("p2_ranked_window", lambda: _noop(ranked))
dead = ranked.filter(F.col("rn") > 1).select("doc_id", "seg_seq")
dead_by_chunk = (
    dead.withColumn("chunk", F.expr(f"doc_id DIV {m.chunk_docs}"))
    .groupBy("seg_seq", "chunk")
    .agg(F.collect_list("doc_id").alias("dead"))
)
leg("p3_dead_by_chunk", lambda: _noop(dead_by_chunk))

rows = None
for meta in metas:
    r = spark.read.parquet(
        os.path.join(segment_dir(ix, meta.segment_id), "postings")
    ).withColumn("seg_seq", F.lit(meta.min_seq))
    rows = r if rows is None else rows.unionByName(r)
leg("p4_rows_scan", lambda: _noop(rows))

# full merge
leg("merge_all", lambda: merge_all(spark, ix, fanin=8))

delta_new = corpus.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3).withColumn(
    "doc_id", F.col("doc_id") + F.lit(1 << 41)
)
t0 = time.perf_counter(); build_segment(spark, delta_new, ix); t["build_delta_new"] = time.perf_counter() - t0

m2 = load_manifest(ix)
metas2 = m2.ordered()
doclens2 = _load_doclens(spark, ix, metas2, m2.num_partitions)
leg("q1_doclens_decode", lambda: _noop(doclens2))
ranked2 = doclens2.withColumn("rn", F.row_number().over(w))
leg("q2_ranked_window", lambda: _noop(ranked2))
leg("merge_incremental", lambda: merge_all(spark, ix, fanin=8))

print("idle after:", round(idle_frac(), 3), flush=True)
print(json.dumps({k: round(v, 3) for k, v in t.items()}))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
