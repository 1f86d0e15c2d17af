"""spark-submit entrypoint: run the training-data curation pipeline.

Usage:
  spark-submit --py-files lucene_mapreduce_spark.zip jobs/curate.py \
      --tables /path/containing/documents.parquet --out /path/curated \
      [--quality-floor 0.5] [--components]

Writes the per-document audit frame (language, quality, dedup flags, final
`kept`) to --out/audit and the surviving documents to --out/kept; with
--components, also writes near-dup cluster assignments to --out/components.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", required=True, help="dir with documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quality-floor", type=float, default=0.5)
    ap.add_argument("--components", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lucene_mapreduce_spark.operators.curation import (
        curation_pipeline,
        near_dup_components,
    )
    from lucene_mapreduce_spark.operators.parity import load

    spark = SparkSession.builder.getOrCreate()
    audit = curation_pipeline(spark, args.tables, quality_floor=args.quality_floor)
    audit.write.mode("overwrite").parquet(f"{args.out}/audit")
    audit = spark.read.parquet(f"{args.out}/audit")  # reuse the written result
    (
        load(spark, args.tables, "documents")
        .join(audit.filter(F.col("kept")).select("doc_id"), "doc_id", "left_semi")
        .write.mode("overwrite")
        .parquet(f"{args.out}/kept")
    )
    if args.components:
        near_dup_components(spark, args.tables).write.mode("overwrite").parquet(
            f"{args.out}/components"
        )
    kept = spark.read.parquet(f"{args.out}/kept").count()
    print(f"curated: {kept} documents kept -> {args.out}/kept")


if __name__ == "__main__":
    main()
