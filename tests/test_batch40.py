"""Tests: round-4 session-13 batch 40 (tuned BM25, background-filtered
significant terms, supplier HHI, equi-depth histogram, semdedup sweep) —
independent recomputes."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, relational, similarity


def _bm25_scores(docs: pd.DataFrame, query: str, k1: float, b: float):
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    dls = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dls.values()) / n
    qterms = sorted(set(tokenize_string(query)))
    df = {q: sum(1 for t in toks.values() if q in t) for q in qterms}
    scores = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s = 0.0
        for q in qterms:  # ascending term order
            if tf[q] == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf[q] * (k1 + 1.0)) / (
                tf[q] + k1 * (1.0 - b + b * dls[d] / avgdl)
            )
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_tuned_recompute(spark, sf_dir):
    out = fulltext.bm25_tuned_topk(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    scores = _bm25_scores(
        docs, fulltext.FLAGSHIP_QUERY, fulltext.TUNED_K1, fulltext.TUNED_B
    )
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert out["doc_id"].tolist() == [d for d, _ in top]
    np.testing.assert_allclose(out["score"], [s for _, s in top], atol=1e-6)
    # tuning actually changes the scores vs the default scorer
    default = _bm25_scores(docs, fulltext.FLAGSHIP_QUERY, 1.2, 0.75)
    assert any(abs(default[d] - s) > 1e-6 for d, s in top if d in default)


def test_sig_terms_bg_recompute(spark, sf_dir):
    out = fulltext.sig_terms_background_filter(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bg = docs[docs["lang"] == fulltext.SIGBG_LANG]
    toks = {int(r.doc_id): set(tokenize_string(r.text)) for r in bg.itertuples()}
    qterms = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = {d for d, ts in toks.items() if ts & qterms}
    n_fg, n_bg = len(hits), len(toks)
    df_fg, df_bg = Counter(), Counter()
    for d, ts in toks.items():
        for t in ts:
            df_bg[t] += 1
            if d in hits:
                df_fg[t] += 1
    rows = [
        (t, df_fg[t], df_bg[t], round((df_fg[t] / n_fg) / (df_bg[t] / n_bg), 6))
        for t in df_fg
        if t not in qterms and df_fg[t] >= fulltext.SIGTERMS_MIN_DF
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    exp = rows[: fulltext.SIGTERMS_K]
    got = [
        (r.term, int(r.df_fg), int(r.df_bg), round(float(r.lift), 6))
        for r in out.itertuples()
    ]
    assert got == exp


def test_supplier_hhi_recompute(spark, sf_dir):
    out = relational.supplier_hhi_by_nation(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    li = li.assign(rev=(li["l_extendedprice"] * (1.0 - li["l_discount"])).round(4))
    j = li.merge(supp[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
    got = {r.n_name: r for r in out.itertuples()}
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))
    for nk, g in j.groupby("s_nationkey"):
        srev = g.groupby("s_suppkey")["rev"].sum()
        nrev = srev.sum()
        shares = srev / nrev
        hhi = round(sum(sorted(round(s * s, 12) for s in shares)), 6)
        r = got[names[nk]]
        assert r.n_suppliers == len(srev)
        assert abs(r.revenue - round(nrev, 4)) < 1e-4
        assert abs(r.hhi - hhi) < 1e-6
        # HHI bounds: [1/n, 1]
        assert 1.0 / len(srev) - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_equidepth_recompute(spark, sf_dir):
    out = relational.equidepth_histogram_totals(spark, sf_dir).toPandas()
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    v = np.sort(od["o_totalprice"].to_numpy())
    bins = relational.EQUIDEPTH_BINS
    edges = [
        float(np.quantile(v, i / bins, method="linear")) for i in range(1, bins)
    ]
    binned = Counter(int(sum(x > e for e in edges)) for x in od["o_totalprice"])
    assert dict(zip(out["bin"], out["n_orders"])) == dict(binned)
    # equi-depth: every bin within 2% of n/bins (type-7 edges on a
    # continuous-ish column)
    n = len(od)
    for c in binned.values():
        assert abs(c - n / bins) <= max(2, 0.02 * n)
    for r in out.itertuples():
        if r.bin > 0:
            assert abs(r.lo_edge - round(edges[r.bin - 1], 6)) < 1e-6


def test_semdedup_sweep_recompute(spark, sf_dir):
    out = similarity.semdedup_threshold_sweep(spark, sf_dir).toPandas()
    pairs = similarity.embedding_near_dup_pairs(
        spark, sf_dir, threshold=min(similarity.SEMDEDUP_SWEEP)
    ).toPandas()
    assert out["threshold"].tolist() == sorted(similarity.SEMDEDUP_SWEEP)
    for r in out.itertuples():
        assert r.n_pairs == int((pairs["cosine"] >= r.threshold).sum())
    # monotone non-increasing in the threshold
    assert list(out["n_pairs"]) == sorted(out["n_pairs"], reverse=True)
