"""Tests: synonym/dismax/block-join/phrase-prefix/range-facet queries and
hybrid RRF fusion — invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, similarity
from lucene_mapreduce_spark.query.bm25 import B, K1


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_synonym_blend_matches_pandas(spark, sf_dir):
    """Blended-tf/max-df BM25 recomputed independently in pandas."""
    out = fulltext.synonym_query(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    toks = docs["text"].map(tokenize_string)
    dls = toks.map(len)
    n_docs, avgdl = float(len(docs)), float(dls.mean())
    syn = set(fulltext.SYNONYM_SET)
    tf = toks.map(lambda ts: sum(1 for t in ts if t in syn))
    df_b = float(
        max(sum(1 for ts in toks if t in ts) for t in syn)
    )
    idf = math.log(1 + (n_docs - df_b + 0.5) / (df_b + 0.5))
    scores = {
        int(d): idf * (f * (K1 + 1.0)) / (f + K1 * (1 - B + B * dl / avgdl))
        for d, f, dl in zip(docs["doc_id"], tf, dls)
        if f > 0
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _ in want]
    for got, (_, s) in zip(out["score"], want):
        assert abs(got - round(s, 6)) < 1e-9


def test_dismax_tie_zero_is_pure_max(spark, sf_dir):
    """With tie=0 dismax degenerates to the plain max of subquery scores."""
    full = fulltext.dismax_query(spark, sf_dir, tie=0.0, k=5).toPandas()
    subs = fulltext.DISMAX_SUBQUERIES
    per = [
        fulltext.bm25_index_topk_documents(spark, sf_dir, q, k=500).toPandas()
        for q in subs
    ]
    best: dict[int, float] = {}
    for p in per:
        for d, s in zip(p["doc_id"], p["score"]):
            best[int(d)] = max(best.get(int(d), 0.0), float(s))
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(full["doc_id"]) == [d for d, _ in want]


def test_block_join_parent_rollup(spark, sf_dir):
    """Every parent's score is the max of its children's exact scores."""
    out = fulltext.block_join_topk(spark, sf_dir, k=5).toPandas()
    child = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=100000
    ).toPandas()
    child["parent"] = child["doc_id"] // fulltext.BLOCK_WIDTH
    roll = child.groupby("parent")["score"].agg(["max", "count"])
    for _, r in out.iterrows():
        assert abs(r["score"] - round(roll.loc[r["parent_id"], "max"], 6)) < 1e-9
        assert r["n_children"] == roll.loc[r["parent_id"], "count"]


def test_phrase_prefix_docs_verified_in_corpus(spark, sf_dir):
    first, prefix = fulltext.PHRASE_PREFIX
    got = {
        r["doc_id"]
        for r in fulltext.phrase_prefix_query(spark, sf_dir).collect()
    }
    docs = _corpus(sf_dir)
    want = set()
    for d, text in zip(docs["doc_id"], docs["text"]):
        ts = tokenize_string(text)
        if any(
            a == first and b.startswith(prefix) for a, b in zip(ts, ts[1:])
        ):
            want.add(int(d))
    assert got == want
    assert want  # the gate query must actually match something


def test_range_facets_cover_hits(spark, sf_dir):
    out = fulltext.range_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qts = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = docs[
        docs["text"].map(lambda t: bool(qts & set(tokenize_string(t))))
    ]
    # the gate ranges partition [0, 1<<20) so every hit lands in a bucket
    assert int(out["n_docs"].sum()) == len(hits)
    for _, r in out.iterrows():
        lo, hi = r["bucket"].strip("[)").split(",")
        n = ((hits["n_chars"] >= int(lo)) & (hits["n_chars"] < int(hi))).sum()
        assert int(r["n_docs"]) == int(n)


def test_rrf_scores_recomputed_from_lists(spark, sf_dir):
    depth, kk = similarity.RRF_DEPTH, similarity.RRF_K
    lex = fulltext.bm25_index_topk_documents(spark, sf_dir, k=depth).toPandas()
    vec = similarity.ann_bruteforce_topk(spark, sf_dir, k=depth).toPandas()
    expect: dict[int, float] = {}
    for d, r in zip(lex["doc_id"], lex["rank"]):
        expect[int(d)] = expect.get(int(d), 0.0) + 1.0 / (kk + int(r))
    for d, r in zip(vec["vec_id"], vec["rank"]):
        expect[int(d)] = expect.get(int(d), 0.0) + 1.0 / (kk + int(r))
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = similarity.rrf_fusion(spark, sf_dir).toPandas()
    assert list(out["doc_id"]) == [d for d, _ in want]
    for got, (_, s) in zip(out["rrf"], want):
        assert abs(got - round(s, 6)) < 1e-9
    # both retrievers must actually contribute to the fused top-10
    lexset, vecset = set(lex["doc_id"]), set(vec["vec_id"])
    fusedset = set(out["doc_id"])
    assert fusedset & lexset and fusedset & vecset
