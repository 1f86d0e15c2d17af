"""spark-submit entrypoint: answer top-k BM25 queries against a built index.

Usage:
  spark-submit --py-files lucene_mapreduce_spark.zip jobs/query_index.py \
      --index /path/to/index_dir --query "terms to search" [-k 10]
  # or a query batch:
  ... --queries /path/to/queries.parquet --out /path/to/results
  # (queries.parquet: query_id string, query_text string)
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("-k", type=int, default=10)
    args = ap.parse_args()

    if args.query and not args.queries:
        # single-query serving path: no Spark job at all
        from lucene_mapreduce_spark.query.wand import IndexSearcher

        for doc_id, score in IndexSearcher(args.index).search(args.query, k=args.k):
            print(f"{doc_id}\t{score:.6f}")
        return

    from pyspark.sql import SparkSession

    from lucene_mapreduce_spark.query.segments import bm25_index_topk

    spark = SparkSession.builder.getOrCreate()
    queries = spark.read.parquet(args.queries)
    out = bm25_index_topk(spark, args.index, queries, k=args.k)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    else:
        out.orderBy("query_id", "rank").show(100, truncate=False)


if __name__ == "__main__":
    main()
