"""Regenerate plans/r06/*_after.txt (+ *_after_executed.txt for the two
queries whose exchange-reuse claims the log cites) from the FINAL round-6
tree. The *_before.txt files are the round-start snapshots and are never
rewritten. Run from the repo root:

    python plans/r06/experiments/gen_plans_after.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

OUT = os.path.join("plans", "r06")
SF = "/root/testdata/sf0.01"


def _fmt(df) -> str:
    from lucene_mapreduce_spark.plans.inspect import explain_str

    return explain_str(df)


def main() -> None:
    from lucene_mapreduce_spark.operators import fulltext
    from lucene_mapreduce_spark.session import get_spark

    spark = get_spark("plans_r6_after", cpus=8)

    def dump(name: str, df, executed: bool = False) -> None:
        with open(os.path.join(OUT, f"{name}_after.txt"), "w") as f:
            f.write(_fmt(df))
        if executed:
            df.collect()
            with open(os.path.join(OUT, f"{name}_after_executed.txt"), "w") as f:
                f.write(_fmt(df))
        print("wrote", name)

    dump("bm25_topk", fulltext.bm25_topk_documents(spark, SF), executed=True)
    dump("bm25_index_topk", fulltext.bm25_index_topk_documents(spark, SF))
    dump("bm25_range_topk", fulltext.bm25_range_topk_documents(spark, SF))
    dump("more_like_this", fulltext.more_like_this_documents(spark, SF))

    # distributed 5-query batch over a bench-shaped index (the bench corpus
    # carries the tokNNNNN vocabulary these queries probe — the sf gate
    # corpus does not, and an empty hit set makes AQE collapse the executed
    # plan to EmptyRelation); executed plan shows whether the candidate
    # branch's phase-1 shuffle is a ReusedExchange (item 9)
    import tempfile

    from lucene_mapreduce_spark.datagen.transcripts import (
        transcripts_df_distributed,
        with_docid,
    )
    from lucene_mapreduce_spark.index.build import build_segment
    from lucene_mapreduce_spark.query.segments import bm25_index_topk

    work = tempfile.mkdtemp(prefix="lmr_plans_")
    corpus = with_docid(
        transcripts_df_distributed(spark, n_conv=20000, seed=42, partitions=8)
    ).select("doc_id", "text")
    ix = os.path.join(work, "ix")
    build_segment(spark, corpus, ix, num_partitions=8)
    qdf = spark.createDataFrame(
        [("q0", "tok00000 tok00001"), ("q1", "tok00002 tok00010 tok00100"),
         ("q2", "tok00005 tok01500"), ("q3", "tok00000 tok00001 tok00002"),
         ("q4", "tok00042")],
        "query_id string, query_text string",
    )
    dump(
        "bm25_batch_index_topk",
        bm25_index_topk(spark, ix, qdf, k=10),
        executed=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
