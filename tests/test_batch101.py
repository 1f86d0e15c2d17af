"""Tests: round-4 session-16 batch 101 — Good-Turing counts, Simpson
diversity, edit-distance vocabulary pairs."""

from __future__ import annotations

import itertools

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def _cf(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = {}
    for t in docs.text:
        for tok in tokenize_string(t):
            cf[tok] = cf.get(tok, 0) + 1
    return cf


def test_good_turing_recompute(spark, sf_dir):
    out = textstats.good_turing_counts(spark, sf_dir).toPandas()
    cf = _cf(sf_dir)
    nr = {}
    for c in cf.values():
        nr[c] = nr.get(c, 0) + 1
    assert len(out) == textstats.GT_MAX_R
    for r in out.itertuples():
        n_r = nr.get(r.r, 0)
        n_r1 = nr.get(r.r + 1, 0)
        assert r.n_r == n_r
        assert r.n_r_plus_1 == n_r1
        if n_r > 0:
            assert abs(r.r_star - (r.r + 1) * n_r1 / n_r) < 1e-6
        else:
            assert pd.isna(r.r_star)


def test_simpson_recompute(spark, sf_dir):
    out = textstats.simpson_diversity_by_source(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.source: r for r in out.itertuples()}
    for src, g in docs.groupby("source"):
        cf = {}
        for t in g.text:
            for tok in tokenize_string(t):
                cf[tok] = cf.get(tok, 0) + 1
        n = sum(cf.values())
        lam = sum(round((c / n) ** 2, 12) for c in cf.values())
        r = rows[src]
        assert r.n_tokens == n
        assert abs(r.simpson_lambda - lam) < 1e-6
        assert abs(r.effective_vocab - 1.0 / lam) < 1e-3
        # effective vocab can never exceed the true vocab
        assert r.effective_vocab <= len(cf) + 1e-6


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def test_vocab_edit_pairs_recompute(spark, sf_dir):
    out = textstats.vocab_edit1_pairs(spark, sf_dir).toPandas()
    cf = _cf(sf_dir)
    exp = []
    for a, b in itertools.combinations(sorted(cf), 2):
        d = _lev(a, b)
        if d <= 2:
            exp.append((a, b, d, cf[a], cf[b]))
    assert len(out) == len(exp)
    for r, (a, b, d, ca, cb) in zip(out.itertuples(), exp):
        assert (r.ta, r.tb, r.dist) == (a, b, d)
        assert (r.cf_a, r.cf_b) == (ca, cb)
    # the gate corpus must produce a non-degenerate candidate table
    assert len(out) > 0
