"""spark-submit entrypoint: build (or incrementally extend) an index.

Usage:
  spark-submit --py-files lucene_mapreduce_spark.zip jobs/build_index.py \
      --input /path/to/transcripts_parquet_or_iceberg \
      --index /path/to/index_dir \
      [--partitions 32] [--merge] [--streaming --checkpoint /path/ckpt]

Input: the transcript table (conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp); a (doc_id, text) table also works.
Package the library with:  (cd repo && zip -r lucene_mapreduce_spark.zip
lucene_mapreduce_spark)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--merge", action="store_true", help="merge_all afterwards")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    ap.add_argument(
        "--store-fields", action="store_true",
        help="docstore sidecar (stored fields: all input columns)",
    )
    ap.add_argument(
        "--with-dict", action="store_true",
        help="term-dictionary sidecar (fuzzy/prefix/wildcard expansion)",
    )
    ap.add_argument(
        "--with-positions", action="store_true",
        help="positional sidecar (phrase/proximity without stored fields)",
    )
    ap.add_argument(
        "--index-fields", default=None,
        help="comma-separated keyword columns to index (field:value clauses)",
    )
    args = ap.parse_args()
    index_fields = (
        [c.strip() for c in args.index_fields.split(",") if c.strip()]
        if args.index_fields
        else None
    )

    from pyspark.sql import SparkSession

    from lucene_mapreduce_spark.datagen.transcripts import with_docid
    from lucene_mapreduce_spark.index.build import build_segment, latest_wins
    from lucene_mapreduce_spark.index.merge import merge_all

    spark = SparkSession.builder.getOrCreate()

    if args.streaming:
        from lucene_mapreduce_spark.streaming.incremental import run_incremental_build

        assert args.checkpoint, "--streaming requires --checkpoint"
        n = run_incremental_build(
            spark, args.input, args.index, args.checkpoint, args.partitions,
            store_fields=args.store_fields, with_dict=args.with_dict,
            with_positions=args.with_positions, index_fields=index_fields,
        )
        print(f"processed {n} micro-batches")
    else:
        df = (
            spark.read.format(args.format).load(args.input)
            if args.format == "iceberg"
            else spark.read.parquet(args.input)
        )
        if "doc_id" not in df.columns:
            df = with_docid(df)
        keep = ["doc_id", "text"] + (index_fields or [])
        corpus = (
            latest_wins(df.select(*keep, "ts")).select(*keep)
            if "ts" in df.columns
            else df.select(*keep)
        )
        meta = build_segment(
            spark, corpus, args.index, num_partitions=args.partitions,
            lineage={"input": args.input},
            store_fields=args.store_fields, with_dict=args.with_dict,
            with_positions=args.with_positions, index_fields=index_fields,
        )
        print(f"built {meta.segment_id}: {meta.n_docs} docs, {meta.n_postings} postings")

    if args.merge:
        seg = merge_all(spark, args.index)
        print(f"merged -> {seg}")


if __name__ == "__main__":
    main()
