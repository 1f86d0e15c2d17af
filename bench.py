"""Headline benchmark: index build throughput, merge, query latency, scaling.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     big parallelism level N_hi (default 32)
  SPARK_GRAFT_CPUS_LO  small level N_lo for the scaling pair (default N_hi/4)
  SPARK_GRAFT_NCONV    transcript conversations for the build bench (default 20000)

The scaling section is the sandbox stand-in for the north rule's N vs 4N
executor requirement: the same build job on the same input at local[N_lo]
and local[N_hi], reporting turns/sec at both plus
efficiency = (thr_hi / thr_lo) / (N_hi / N_lo).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS_HI = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# scaling pair: N vs 4N worker cores. On this single box each core pairs a
# JVM task thread with a Python Arrow worker, so the pair tops out at 16
# (=32 busy cores) to avoid oversubscription polluting the measurement.
CPUS_SCALE_LO = int(os.environ.get("SPARK_GRAFT_CPUS_LO", "4"))
CPUS_SCALE_HI = int(os.environ.get("SPARK_GRAFT_CPUS_SCALE_HI", "16"))
N_CONV = int(os.environ.get("SPARK_GRAFT_NCONV", "250000"))

BENCH_QUERIES = [
    "tok00000 tok00001",
    "tok00002 tok00010 tok00100",
    "tok00005 tok01500",
    "tok00000 tok00001 tok00002 tok00004 tok00010",
    "tok00042",
]


def _new_session(cpus: int):
    from lucene_mapreduce_spark.session import get_spark

    return get_spark(f"bench_{cpus}", cpus=cpus, shuffle_partitions=cpus)


def _build_corpus(spark, n_conv: int):
    from pyspark.sql import functions as F

    from lucene_mapreduce_spark.datagen.transcripts import (
        transcripts_df_distributed,
        with_docid,
    )

    return (
        with_docid(transcripts_df_distributed(spark, n_conv=n_conv, seed=42))
        .select("doc_id", "text")
    )


def _timed_build(
    spark, corpus_path: str, index_dir: str, warm_dir: str, reps: int = 1
) -> tuple[float, int]:
    """JIT/codegen-warm the session with a small throwaway build, then time
    the real one (best of `reps`) — so the N vs 4N comparison measures
    compute, not first-job JVM warmup or GC noise."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from lucene_mapreduce_spark.index.build import build_segment

    corpus = spark.read.parquet(corpus_path)
    n_turns = corpus.count()  # warm the file listing; count is the metric base
    warm = corpus.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
    build_segment(spark, warm, warm_dir, num_partitions=32)
    import gc as _gc

    best = None
    for r in range(reps):
        _gc.collect()
        spark.sparkContext._jvm.System.gc()  # tame GC drift between reps
        tgt = index_dir if r == reps - 1 else index_dir + f"_r{r}"
        t0 = time.perf_counter()
        build_segment(spark, corpus, tgt, num_partitions=32)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        if tgt != index_dir:
            _sh.rmtree(tgt, ignore_errors=True)
    return best, n_turns


def main() -> None:
    timings: dict[str, float] = {}
    extra: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="lmr_bench_")
    total_t0 = time.perf_counter()

    # ---------- corpus materialization (shared input for both scaling runs)
    spark = _new_session(CPUS_HI)
    corpus_path = os.path.join(work, "corpus")
    t0 = time.perf_counter()
    _build_corpus(spark, N_CONV).write.mode("overwrite").parquet(corpus_path)
    timings["datagen"] = round(time.perf_counter() - t0, 3)

    # ---------- scaling pair leg 1: same build, lo parallelism (run FIRST
    # so neither leg benefits from the other's OS page cache asymmetrically)
    spark.stop()
    spark_lo = _new_session(CPUS_SCALE_LO)
    ix_lo = os.path.join(work, "ix_lo")
    t_lo, _ = _timed_build(
        spark_lo, corpus_path, ix_lo, os.path.join(work, "warm_lo"), reps=2
    )
    timings["index_build_lo"] = round(t_lo, 3)
    spark_lo.stop()

    # ---------- scaling pair leg 2 = the main build @ 4N cores
    spark = _new_session(CPUS_SCALE_HI)
    ix_hi = os.path.join(work, "ix_hi")
    t_hi, n_turns = _timed_build(
        spark, corpus_path, ix_hi, os.path.join(work, "warm_hi"), reps=2
    )
    timings["index_build"] = round(t_hi, 3)

    from lucene_mapreduce_spark.index.merge import merge_all

    # second batch (update stream) + hierarchical merge
    from pyspark.sql import functions as F

    from lucene_mapreduce_spark.index.build import build_segment

    corpus = spark.read.parquet(corpus_path)
    delta = corpus.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).withColumn(
        "text", F.concat(F.lit("updated "), F.col("text"))
    )
    t0 = time.perf_counter()
    build_segment(spark, delta, ix_hi)
    timings["index_build_delta"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    merge_all(spark, ix_hi, fanin=8)
    timings["merge_all"] = round(time.perf_counter() - t0, 3)

    # ---------- distributed batch query path
    from lucene_mapreduce_spark.query.segments import bm25_index_topk

    qdf = spark.createDataFrame(
        [(f"q{i}", q) for i, q in enumerate(BENCH_QUERIES)],
        "query_id string, query_text string",
    )
    t0 = time.perf_counter()
    bm25_index_topk(spark, ix_hi, qdf, k=10).collect()
    timings["bm25_batch_query"] = round(time.perf_counter() - t0, 3)

    # ---------- oracle-suite headliners on the sf tables
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("bm25_topk", "ttl_anti_join", "latest_per_key", "generation_fallback"):
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    spark.stop()

    # ---------- WAND serving latency (no Spark in the loop)
    from lucene_mapreduce_spark.query.wand import IndexSearcher

    searcher = IndexSearcher(ix_hi)
    cold: list[float] = []
    for q in BENCH_QUERIES:  # cold: empty posting cache each time
        searcher._cache.clear(); searcher._scored_cache.clear()
        t0 = time.perf_counter()
        searcher.search(q, k=10)
        cold.append(time.perf_counter() - t0)
    lat: list[float] = []
    for i in range(200):  # warm: posting cache resident (steady serving)
        q = BENCH_QUERIES[i % len(BENCH_QUERIES)]
        t0 = time.perf_counter()
        searcher.search(q, k=10)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    cold.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]
    timings["wand_p95_query"] = round(p95, 4)
    extra["serving"] = {
        "wand_cold_max_s": round(cold[-1], 4),
        "wand_p50_s": round(p50, 4),
        "wand_p95_s": round(p95, 4),
        "queries_per_sec": round(1.0 / max(sum(lat) / len(lat), 1e-9), 1),
    }

    thr_hi = n_turns / t_hi
    thr_lo = n_turns / t_lo
    eff = (thr_hi / thr_lo) / (CPUS_SCALE_HI / CPUS_SCALE_LO)
    extra["throughput"] = {
        "turns_indexed": n_turns,
        "turns_per_sec_hi": round(thr_hi, 1),
        "turns_per_sec_lo": round(thr_lo, 1),
    }
    extra["scaling"] = {
        "cores_lo": CPUS_SCALE_LO,
        "cores_hi": CPUS_SCALE_HI,
        "efficiency": round(eff, 3),
    }

    shutil.rmtree(work, ignore_errors=True)

    out = {
        "metric": "index build+merge+query wall clock (turns/sec + p95 in extras)",
        "value": round(time.perf_counter() - total_t0, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
