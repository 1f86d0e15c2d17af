"""Tests: round-4 session-16 batch 91 — packing attention waste,
pass@k estimator, hapax report."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def test_packing_waste_recompute(spark, sf_dir):
    out = textstats.packing_attention_waste(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    B = textstats.PACKING_BUDGET
    exp = {}
    for src, g in docs.groupby("source"):
        g = g.sort_values("doc_id")
        off = 0
        bins = {}
        for t in g.text:
            dl = len(tokenize_string(t))
            if dl == 0:
                continue
            b0, b1 = off // B, (off + dl - 1) // B
            for b in range(b0, b1 + 1):
                seg = min(off + dl, (b + 1) * B) - max(off, b * B)
                s2, tot, ns = bins.get(b, (0, 0, 0))
                bins[b] = (s2 + seg * seg, tot + seg, ns + 1)
            off += dl
        fulls = [
            (round(1.0 - s2 / (B * B), 12), ns)
            for s2, tot, ns in bins.values()
            if tot == B
        ]
        if fulls:
            exp[src] = (
                len(fulls),
                sum(f[0] for f in fulls) / len(fulls),
                sum(f[1] for f in fulls) / len(fulls),
            )
    assert len(out) == len(exp)
    for r in out.itertuples():
        n, mc, md = exp[r.source]
        assert r.n_full_bins == n
        assert abs(r.mean_cross_frac - mc) < 1e-5
        assert abs(r.mean_docs_per_bin - md) < 1e-5
    # packed contexts hold multiple short docs: waste must be real
    assert (out.mean_cross_frac > 0).all()
    assert (out.mean_cross_frac < 1).all()


def test_pass_at_k_recompute(spark, sf_dir):
    out = textstats.pass_at_k_estimate(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    k = textstats.PASS_AT_K
    vals = []
    for _, g in ev.groupby("user_id"):
        n = len(g)
        c = int((g.event_type == "purchase").sum())
        if n < k:
            continue
        if n - c < k:
            p = 1.0
        else:
            p = 1.0
            for i in range(k):
                p *= (n - c - i) / (n - i)
            p = 1.0 - p
        vals.append(round(p, 12))
    assert r.n_tasks == len(vals)
    assert r.k == k
    assert abs(r.mean_pass_at_k - sum(vals) / len(vals)) < 1e-5
    assert 0.0 <= r.mean_pass_at_k <= 1.0


def test_hapax_recompute(spark, sf_dir):
    out = textstats.hapax_report(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.source: r for r in out.itertuples()}
    corpus_cf = {}
    for src, g in docs.groupby("source"):
        cf = {}
        for t in g.text:
            for tok in tokenize_string(t):
                cf[tok] = cf.get(tok, 0) + 1
                corpus_cf[tok] = corpus_cf.get(tok, 0) + 1
        r = rows[src]
        assert r.vocab == len(cf)
        assert r.hapax == sum(1 for v in cf.values() if v == 1)
    r = rows["(corpus)"]
    assert r.vocab == len(corpus_cf)
    assert r.hapax == sum(1 for v in corpus_cf.values() if v == 1)
