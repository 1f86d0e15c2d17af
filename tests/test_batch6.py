"""Tests: round-3 session-4 operators (constant-score / FILTER occur /
TermsSet / CommonTerms / nested spans / stats facets / delete-by-query /
BM25F / session windows / cluster representatives) — invariants beyond
the DuckDB oracle gate."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import curation, fulltext
from lucene_mapreduce_spark.query.bm25 import B, K1


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_constant_score_boost_and_filter(spark, sf_dir):
    term, lo, hi, boost = fulltext.CONST_SCORE
    out = fulltext.constant_score_query(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["score"] == boost).all()
    docs = _corpus(sf_dir)
    expected = {
        int(r.doc_id)
        for r in docs.itertuples()
        if lo <= r.n_chars <= hi and term in tokenize_string(r.text)
    }
    assert set(out["doc_id"]) == expected


def test_filter_clause_scoreless_filter(spark, sf_dir):
    should, filt = fulltext.FILTER_CLAUSE
    out = fulltext.filter_clause_query(spark, sf_dir, k=10_000).toPandas()
    docs = _corpus(sf_dir)
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    # every hit contains the filter term; the hit set is exactly them
    expected = {d for d, ts in toks.items() if filt in ts}
    assert set(out["doc_id"]) == expected
    # docs with no SHOULD term present score exactly 0
    sterms = set(tokenize_string(should))
    zero = out[out["doc_id"].map(lambda d: not (sterms & set(toks[d])))]
    assert (zero["score"] == 0.0).all()


def test_terms_set_required_from_field(spark, sf_dir):
    out = fulltext.terms_set_query(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["required"].isin([1, 2, 3]).all()
    assert (out["n_matched"] >= out["required"]).all()
    docs = _corpus(sf_dir)
    qs = set(fulltext.TERMS_SET_TERMS.split())
    exp = {}
    for r in docs.itertuples():
        m = len(qs & set(tokenize_string(r.text)))
        req = 1 + int(r.n_chars) % 3
        if m >= req:
            exp[int(r.doc_id)] = (m, req)
    got = {
        int(r.doc_id): (int(r.n_matched), int(r.required))
        for r in out.itertuples()
    }
    assert got == exp


def test_common_terms_all_high_is_plain_bm25(spark, sf_dir):
    """With maxTermFrequency=1.0 every term is 'common' (no MUST clause), so
    CommonTermsQuery degrades to the plain SHOULD BM25 of the same terms."""
    from lucene_mapreduce_spark.query.segments import bm25_index_topk

    q = "table scan"
    out = fulltext.common_terms_query(spark, sf_dir, q, max_tf=1.0, k=10).toPandas()
    ix = fulltext._gate_index(spark, sf_dir)
    qdf = spark.createDataFrame(
        [("q0", q)], "query_id string, query_text string"
    )
    ref = (
        bm25_index_topk(spark, ix, qdf, k=10, round_to=6)
        .select("doc_id", "score", "rank")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        out.sort_values("rank").reset_index(drop=True),
        ref.sort_values("rank").reset_index(drop=True),
        check_dtype=False,
    )


def test_delete_by_query_absent_term_is_noop(spark, sf_dir):
    """Deleting by a term with no postings changes nothing: identical to the
    flagship scan-path top-k (both rounded to 6dp)."""
    out = fulltext.delete_by_query(spark, sf_dir, del_term="zzzunseen").toPandas()
    ref = fulltext.bm25_topk_documents(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ref.reset_index(drop=True), check_dtype=False
    )


def test_delete_by_query_excludes_and_rescales(spark, sf_dir):
    """Real delete: no hit contains the deleted term, and scores equal a
    pandas BM25 recomputed over the surviving corpus (float64, 6dp)."""
    del_term = fulltext.DELETE_TERM
    out = fulltext.delete_by_query(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    alive = {d: ts for d, ts in toks.items() if del_term not in ts}
    assert set(out["doc_id"]) <= set(alive)
    n = len(alive)
    avgdl = sum(len(ts) for ts in alive.values()) / n
    qterms = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    dfs = {t: sum(1 for ts in alive.values() if t in ts) for t in qterms}
    scores = {}
    for d, ts in alive.items():
        s = 0.0
        for t in qterms:  # ascending term order — canonical accumulation
            tf = ts.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(int(r.doc_id), r.score) for r in out.itertuples()] == top


def test_span_or_near_membership(spark, sf_dir):
    a, b, c, dist = fulltext.SPAN_OR_NEAR
    out = fulltext.span_or_near_query(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    exp = set()
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        pab = [i for i, t in enumerate(ts) if t in (a, b)]
        pc = [i for i, t in enumerate(ts) if t == c]
        if any(abs(p - q) <= dist for p in pab for q in pc):
            exp.add(int(r.doc_id))
    assert set(out["doc_id"]) == exp


def test_hit_stats_facets_pandas(spark, sf_dir):
    out = fulltext.hit_stats_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qs = set(fulltext.BOOLEAN_QUERY.split())
    hit = docs[docs["text"].map(lambda t: bool(qs & set(tokenize_string(t))))]
    exp = (
        hit.groupby("lang")["n_chars"]
        .agg(n_docs="count", min_chars="min", max_chars="max", sum_chars="sum")
        .reset_index()
    )
    got = out.set_index("lang")
    for r in exp.itertuples():
        row = got.loc[r.lang]
        assert int(row["n_docs"]) == r.n_docs
        assert int(row["min_chars"]) == r.min_chars
        assert int(row["max_chars"]) == r.max_chars
        assert int(row["sum_chars"]) == r.sum_chars
    assert len(out) == len(exp)


def test_bm25f_pandas_exact(spark, sf_dir):
    """Full float64 BM25F recompute in pandas: field-weighted tf, any-field
    df, no (k1+1) factor — scores match to 6dp after identical rounding."""
    out = fulltext.bm25f_topk(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    w_text, w_kw = fulltext.BM25F_W
    qterms = sorted(set(tokenize_string(fulltext.BM25F_QUERY)))
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    src = {int(r.doc_id): r.source for r in docs.itertuples()}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    dfa = {
        t: sum(
            1
            for d in toks
            if t in toks[d] or src[d] == t
        )
        for t in qterms
    }
    scores = {}
    for d in toks:
        s = 0.0
        for t in qterms:
            tf_text = toks[d].count(t)
            tf_kw = 1.0 if src[d] == t else 0.0
            if tf_text == 0 and tf_kw == 0:
                continue
            norm = (1 - B) + B * len(toks[d]) / avgdl
            tfn = w_text * tf_text / norm + w_kw * tf_kw
            idf = math.log(1 + (n - dfa[t] + 0.5) / (dfa[t] + 0.5))
            s += idf * tfn / (K1 + tfn)
        if s > 0:
            scores[d] = round(s, 6)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(int(r.doc_id), r.score) for r in out.itertuples()] == top


def test_streaming_session_windows_equals_batch(spark, sf_dir):
    """Complete-mode streaming session windows == batch session_window
    aggregation on the same input."""
    from lucene_mapreduce_spark.operators.parity import load
    from lucene_mapreduce_spark.streaming.incremental import (
        streaming_session_windows,
    )

    got = (
        streaming_session_windows(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    derived = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    ref = (
        derived.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_cluster_representative_is_longest_member(spark, sf_dir):
    comp = curation.near_dup_components(spark, sf_dir).toPandas()
    out = curation.cluster_representative(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    dl = {int(r.doc_id): len(tokenize_string(r.text)) for r in docs.itertuples()}
    groups = comp.groupby("component")["doc_id"].apply(list).to_dict()
    assert set(out["component"]) == set(groups)
    for r in out.itertuples():
        members = groups[r.component]
        assert r.kept_doc_id in members
        best = max(members, key=lambda d: (dl[d], -d))
        assert (r.kept_doc_id, r.kept_dl) == (best, dl[best])
        assert r.n_members == len(members)


def test_infix_suggest_contains_and_rank(spark, sf_dir):
    out = fulltext.infix_suggest(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["term"].str.contains(fulltext.INFIX_QUERY).all()
    docs = _corpus(sf_dir)
    from collections import Counter

    cf = Counter(t for txt in docs["text"] for t in tokenize_string(txt))
    cand = sorted(
        ((t, c) for t, c in cf.items() if fulltext.INFIX_QUERY in t),
        key=lambda tc: (-tc[1], tc[0]),
    )[:5]
    assert [(r.term, r.cf) for r in out.itertuples()] == cand


def test_term_vectors_match_tokenization(spark, sf_dir):
    out = fulltext.term_vectors(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    txt = docs.loc[docs["doc_id"] == fulltext.EXPLAIN_DOC, "text"].iloc[0]
    ts = tokenize_string(txt)
    exp = sorted(
        ((t, ts.count(t), i) for i, t in enumerate(ts)),
        key=lambda r: (r[0], r[2]),
    )
    assert [(r.term, r.tf, r.pos) for r in out.itertuples()] == exp


def test_percolate_membership(spark, sf_dir):
    out = fulltext.percolate_match(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    toks = {int(r.doc_id): set(tokenize_string(r.text)) for r in docs.itertuples()}
    exp = set()
    for qid, qtext in fulltext.PERCOLATE_QUERIES:
        need = set(tokenize_string(qtext))
        for d, ts in toks.items():
            if need <= ts:
                exp.add((qid, d))
    assert {(r.query_id, r.doc_id) for r in out.itertuples()} == exp


def test_events_rollup_lattice_consistency(spark, sf_dir):
    from lucene_mapreduce_spark.operators import parity

    out = parity.events_rollup(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    total = out[(out["event_type"] == "<all>") & (out["day"] == "<all>")]
    assert len(total) == 1 and int(total["n_events"].iloc[0]) == len(ev)
    # per-type subtotals equal the sum of their day rows
    leaves = out[(out["event_type"] != "<all>") & (out["day"] != "<all>")]
    subs = out[(out["event_type"] != "<all>") & (out["day"] == "<all>")]
    agg = leaves.groupby("event_type")["n_events"].sum()
    for r in subs.itertuples():
        assert int(r.n_events) == int(agg[r.event_type])
