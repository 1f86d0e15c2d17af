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


def test_explain_contribs_sum_to_doc_score(spark, sf_dir):
    """The per-term breakdown must re-assemble into the doc's gate score."""
    br = fulltext.explain_scores(spark, sf_dir).toPandas()
    allhits = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=100000
    ).toPandas()
    mine = allhits[allhits["doc_id"] == fulltext.EXPLAIN_DOC]
    if len(br) == 0:
        assert len(mine) == 0
    else:
        # contribs are individually rounded; the sum matches to 6dp slack
        assert abs(br["contrib"].sum() - float(mine["score"].iloc[0])) < 1e-5
        assert (br["df_t"] > 0).all() and (br["tf"] > 0).all()


def test_drill_sideways_invariants(spark, sf_dir):
    fld, val = fulltext.DRILL_DOWN
    out = fulltext.drill_sideways_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qts = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = docs[docs["text"].map(lambda t: bool(qts & set(tokenize_string(t))))]
    lang_rows = out[out["dim"] == fld]
    # drilled dim counts the UNDRILLED hit set (sibling values visible)
    assert int(lang_rows["n_docs"].sum()) == len(hits)
    src_rows = out[out["dim"] != fld]
    assert int(src_rows["n_docs"].sum()) == int((hits[fld] == val).sum())


def test_kmv_sketch_matches_reference_formula(spark, sf_dir):
    import hashlib

    out = fulltext.kmv_distinct_tokens(spark, sf_dir).toPandas().iloc[0]
    docs = _corpus(sf_dir)
    vocab = sorted({t for x in docs["text"] for t in tokenize_string(x)})
    hs = sorted(
        int(hashlib.md5(t.encode()).hexdigest()[:13], 16) for t in vocab
    )
    k = fulltext.KMV_K
    kth = hs[: k][-1]
    assert int(out["n_exact"]) == len(vocab)
    assert int(out["kth_hash"]) == kth
    assert abs(out["estimate"] - round((k - 1) * (1 << 52) / kth, 6)) < 1e-9


def test_span_queries_verified_in_corpus(spark, sf_dir):
    term, end = fulltext.SPAN_FIRST
    inc, exc, dist = fulltext.SPAN_NOT
    docs = _corpus(sf_dir)
    got_first = {
        r["doc_id"] for r in fulltext.span_first_query(spark, sf_dir).collect()
    }
    got_not = {
        r["doc_id"] for r in fulltext.span_not_query(spark, sf_dir).collect()
    }
    want_first, want_not = set(), set()
    for d, text in zip(docs["doc_id"], docs["text"]):
        ts = tokenize_string(text)
        if term in ts[:end]:
            want_first.add(int(d))
        pi = [i for i, t in enumerate(ts) if t == inc]
        pe = [i for i, t in enumerate(ts) if t == exc]
        if any(all(abs(p - q) > dist for q in pe) for p in pi):
            want_not.add(int(d))
    assert got_first == want_first and want_first
    assert got_not == want_not and want_not


def test_dl_percentiles_match_numpy(spark, sf_dir):
    import numpy as np

    out = fulltext.dl_percentiles(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    dls = np.array([len(tokenize_string(t)) for t in docs["text"]], dtype=float)
    for _, r in out.iterrows():
        want = np.quantile(dls, r["p"])  # numpy default = type-7 linear
        assert abs(r["dl_quantile"] - round(want, 6)) < 1e-9


def test_rescore_phrase_boost(spark, sf_dir):
    """Docs matching the phrase gain exactly +weight; others unchanged;
    second pass never adds docs beyond the first-pass page."""
    base = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=fulltext.RESCORE_DEPTH
    ).toPandas()
    out = fulltext.rescore_topk(spark, sf_dir, k=50).toPandas()
    docs = _corpus(sf_dir)
    a, b = fulltext.PHRASE_QUERY.split()
    phrased = set()
    for d, text in zip(docs["doc_id"], docs["text"]):
        ts = tokenize_string(text)
        if any(x == a and y == b for x, y in zip(ts, ts[1:])):
            phrased.add(int(d))
    base_scores = dict(zip(base["doc_id"], base["score"]))
    assert set(out["doc_id"]) <= set(base_scores)
    for _, r in out.iterrows():
        boost = fulltext.RESCORE_WEIGHT if r["doc_id"] in phrased else 0.0
        assert abs(r["score"] - round(base_scores[r["doc_id"]] + boost, 6)) < 1e-9
    assert phrased & set(out["doc_id"])  # the boost actually fired


def test_function_score_is_field_scaled_bm25(spark, sf_dir):
    import math as m

    out = fulltext.function_score_query(spark, sf_dir, k=10).toPandas()
    allhits = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=100000
    ).toPandas()
    docs = _corpus(sf_dir).set_index("doc_id")
    fused = {
        int(d): float(s) * m.log(1.0 + float(docs.loc[int(d), "n_chars"]))
        for d, s in zip(allhits["doc_id"], allhits["score"])
    }
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _ in want]
