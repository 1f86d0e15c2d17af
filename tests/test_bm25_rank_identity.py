"""Rank-identity: the distributed BM25 scan scorer vs the pandas oracle.

North-rule gate: top-k docIDs AND scores must be identical (float64 exact —
both paths accumulate in canonical ascending-term order).
"""

from __future__ import annotations

import math

import pytest

from lucene_mapreduce_spark.datagen.transcripts import transcripts_df, with_docid
from lucene_mapreduce_spark.query.bm25 import bm25_oracle_pandas
from lucene_mapreduce_spark.query.bm25_df import bm25_scan_topk

QUERIES = [
    ("q_head", "tok00000 tok00001"),          # head terms (Zipf skew)
    ("q_tail", "tok01999 tok01543"),          # tail terms
    ("q_mixed", "tok00000 tok01998"),
    ("q_single", "tok00002"),
    ("q_dup_terms", "tok00003 tok00003 tok00003"),  # duplicate query terms count once
    ("q_absent", "zzz_not_in_corpus"),        # must yield empty top-k
    ("q_many", "tok00000 tok00001 tok00002 tok00004 tok00010 tok00100 tok01000"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_docid(transcripts_df(spark, n_conv=120, seed=7)).cache()
    pdf = df.select("doc_id", "text").toPandas()
    return df, pdf


def test_rank_identity_scan_vs_oracle(spark, corpus):
    df, pdf = corpus
    queries = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    got = (
        bm25_scan_topk(df, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    for qid, qtext in QUERIES:
        expected = bm25_oracle_pandas(pdf, qtext, k=10)
        actual = got[got.query_id == qid].reset_index(drop=True)
        assert list(actual.doc_id) == list(expected.doc_id), f"{qid}: docids differ"
        for a, e in zip(actual.score, expected.score):
            assert math.isclose(a, e, rel_tol=0, abs_tol=0) or a == e, (
                f"{qid}: score {a!r} != {e!r}"
            )


def test_determinism_across_parallelism(spark, corpus):
    """Same input, different partitioning => identical scores (bitwise).

    This is the sandbox stand-in for the N vs 4N executor consistency
    requirement: partition the corpus 2 ways and demand equal results.
    """
    df, _ = corpus
    queries = spark.createDataFrame(QUERIES[:4], "query_id string, query_text string")
    a = bm25_scan_topk(df.repartition(3), queries, k=10).toPandas()
    b = bm25_scan_topk(df.repartition(17), queries, k=10).toPandas()
    a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.score) == list(b.score)  # exact float equality


def test_empty_query_and_empty_docs(spark, corpus):
    df, pdf = corpus
    queries = spark.createDataFrame(
        [("q_empty", ""), ("q_ws", "   \t ")], "query_id string, query_text string"
    )
    got = bm25_scan_topk(df, queries, k=10).count()
    assert got == 0
