"""Tests: round-4 session-17 batch 148 — negbin fit,
capture-recapture, Chao1."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity


def test_negbin_recompute(spark, sf_dir):
    out = parity.negbin_moment_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index()
    m, v = y.mean(), y.var(ddof=1)
    assert out.n_days == len(y)
    assert abs(out.mean_daily - m) < 1e-6
    assert abs(out.var_daily - v) < 1e-5
    assert abs(out.dispersion_ratio - v / m) < 1e-6
    if v > m:
        assert abs(out.nb_r - m * m / (v - m)) < 1e-4
        assert abs(out.nb_p - m / v) < 1e-6
    else:
        assert pd.isna(out.nb_r) and pd.isna(out.nb_p)


def test_capture_recapture_recompute(spark, sf_dir):
    out = parity.capture_recapture_users(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = sorted(ev.user_id.unique())

    def draw(salt, u):
        return (
            int(hashlib.md5(f"{salt}:{u}".encode()).hexdigest()[:13], 16)
            % parity.CR_SAMPLE_MOD
            == 0
        )

    n1 = sum(draw("cap1", u) for u in users)
    n2 = sum(draw("cap2", u) for u in users)
    m = sum(draw("cap1", u) and draw("cap2", u) for u in users)
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert (out.n_true, out.n1, out.n2, out.m) == (len(users), n1, n2, m)
    if m > 0:
        assert abs(out.lincoln_petersen - n1 * n2 / m) < 1e-5
    assert abs(out.chapman - chap) < 1e-5
    assert abs(out.chapman_over_true - chap / len(users)) < 1e-6


def test_chao1_recompute(spark, sf_dir):
    out = parity.chao1_vocab_estimate(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = Counter()
    for t in docs.text:
        cf.update(tokenize_string(t))
    s_obs = len(cf)
    f1 = sum(1 for v in cf.values() if v == 1)
    f2 = sum(1 for v in cf.values() if v == 2)
    n = sum(cf.values())
    chao = s_obs + (
        f1 * f1 / (2 * f2) if f2 > 0 else f1 * (f1 - 1) / 2
    )
    assert (out.s_obs, out.f1, out.f2, out.n_tokens) == (s_obs, f1, f2, n)
    assert abs(out.chao1 - chao) < 1e-6
    assert abs(out.goods_coverage - (1 - f1 / n)) < 1e-6
    # a closed saturated vocabulary: Chao1 collapses onto S_obs
    assert out.chao1 >= out.s_obs
