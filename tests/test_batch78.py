"""Tests: round-4 session-16 batch 78 — shingle-field BM25, index-sort
early-termination plan, HLL register union by source."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1


def _bm25_leg(doc_toks: dict, qterms: list[str]):
    """Per-doc BM25 over a token-list dict {doc_id: [tokens]}."""
    dls = {d: len(t) for d, t in doc_toks.items()}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    scores = {}
    for t in sorted(set(qterms)):
        df = sum(1 for toks in doc_toks.values() if t in toks)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, toks in doc_toks.items():
            tf = toks.count(t)
            if tf == 0:
                continue
            denom = tf + K1 * (1 - B + B * dls[d] / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1.0) / denom
    return scores


def test_shingle_field_recompute(spark, sf_dir):
    out = fulltext.shingle_field_topk(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    uni = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    bi = {
        d: [f"{a} {b}" for a, b in zip(t, t[1:])]
        for d, t in uni.items()
        if len(t) >= 2
    }
    qt = tokenize_string(fulltext.FLAGSHIP_QUERY)
    s1 = _bm25_leg(uni, qt)
    s2 = _bm25_leg(bi, [f"{a} {b}" for a, b in zip(qt, qt[1:])])
    comb = {
        d: s1.get(d, 0.0) + fulltext.SHINGLE_W * s2.get(d, 0.0)
        for d in set(s1) | set(s2)
    }
    exp = sorted(comb.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    assert len(out) == min(10, len(exp))
    for r, (d, sc) in zip(out.itertuples(), exp):
        assert r.doc_id == d
        assert abs(r.score - sc) < 2e-6
        assert abs(r.shingle_score - s2.get(d, 0.0)) < 2e-6
    # the shingle leg must actually contribute for the flagship query
    assert out.shingle_score.abs().sum() > 0


def test_index_sort_plan_recompute(spark, sf_dir):
    out = fulltext.index_sort_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "n_chars"]
    ].copy()
    k = fulltext.SORT_PLAN_K
    nseg = fulltext.SORT_PLAN_SEGMENTS
    docs = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    topk = set(docs.doc_id.iloc[:k])
    docs["seg"] = docs.doc_id % nseg
    docs["r"] = docs.groupby("seg").cumcount() + 1
    assert len(out) == docs.seg.nunique()
    total_saved = 0
    for r in out.itertuples():
        g = docs[docs.seg == r.seg]
        hits = g[g.doc_id.isin(topk)]
        assert r.n_docs == len(g)
        assert r.n_in_topk == len(hits)
        deepest = int(hits.r.max()) if len(hits) else 0
        assert r.deepest_rank_needed == deepest
        assert r.rows_saved == len(g) - deepest
        total_saved += r.rows_saved
    # early termination must save real work: every segment stops early
    assert total_saved > 0
    assert out.n_in_topk.sum() == k


def _hll_est(terms):
    m = 1 << textstats.HLL_P
    regs = {}
    for t in terms:
        h = int(hashlib.md5(t.encode()).hexdigest()[:13], 16)
        b, w = h >> 40, h & ((1 << 40) - 1)
        rho = 41 if w == 0 else 40 - int(math.floor(math.log2(w)))
        regs[b] = max(regs.get(b, 0), rho)
    used = len(regs)
    s = sum(1 << (41 - mj) for mj in regs.values()) + (m - used) * (1 << 41)
    alpha_num = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 41)
    e_raw = alpha_num / s
    v = float(m - used)
    if e_raw <= 2.5 * m and v > 0:
        return m * math.log(m / v), used
    return e_raw, used


def test_hll_union_recompute(spark, sf_dir):
    out = textstats.hll_union_sources(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    by_src = {}
    for r in docs.itertuples():
        by_src.setdefault(r.source, set()).update(tokenize_string(r.text))
    all_terms = set().union(*by_src.values())
    rows = {r.source: r for r in out.itertuples()}
    assert set(rows) == set(by_src) | {"(union)"}
    for src, terms in by_src.items():
        est, used = _hll_est(terms)
        assert rows[src].n_exact == len(terms)
        assert rows[src].used == used
        assert abs(rows[src].hll_estimate - est) < 5e-4
    est, used = _hll_est(all_terms)
    u = rows["(union)"]
    assert u.n_exact == len(all_terms)
    assert u.used == used and abs(u.hll_estimate - est) < 5e-4
    # merged registers can never claim fewer used buckets than any input
    assert u.used >= max(r.used for s, r in rows.items() if s != "(union)")
