from lucene_mapreduce_spark.query.bm25 import (
    B,
    K1,
    bm25_contribution,
    bm25_idf,
    bm25_oracle_pandas,
)
from lucene_mapreduce_spark.query.bm25_df import bm25_scan_topk, corpus_postings

__all__ = [
    "B",
    "K1",
    "bm25_contribution",
    "bm25_idf",
    "bm25_oracle_pandas",
    "bm25_scan_topk",
    "corpus_postings",
]
