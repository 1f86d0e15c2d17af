"""Tests: round-4 session-18 batch 163 — Ljung-Box, isotonic, Storey."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_ljung_box_recompute(spark, sf_dir):
    out = parity.ljung_box_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    y = np.array(
        ed.value_counts().reindex(cal, fill_value=0).sort_index(),
        dtype=float,
    )
    n = len(y)
    mu = y.mean()
    c0 = ((y - mu) ** 2).sum()
    q = 0.0
    rks = {}
    for k in range(1, parity.LJUNG_BOX_LAGS + 1):
        ck = ((y[:-k] - mu) * (y[k:] - mu)).sum()
        rk = ck / c0
        rks[k] = rk
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert out.n_days == n
    assert out.n_lags == parity.LJUNG_BOX_LAGS
    for k, col in [(1, "acf_1"), (2, "acf_2"), (3, "acf_3")]:
        assert abs(getattr(out, col) - rks[k]) < 1e-5
    assert abs(out.q_stat - q) < 1e-3


def test_isotonic_recompute(spark, sf_dir):
    out = parity.isotonic_calibration_bins(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev.value / (ev.value + 50.0)
    y = (ev.event_type == "purchase").astype(int)
    b = np.minimum(9, np.floor(p * 10)).astype(int)
    per = pd.DataFrame({"b": b, "y": y}).groupby("b").agg(
        nb=("y", "size"), yb=("y", "sum")
    )
    bins = list(per.index)
    # PAVA via the minimax identity
    for row in out.itertuples():
        i = row.bin
        best = -1.0
        for k in [x for x in bins if x <= i]:
            worst = 2.0
            for j in [x for x in bins if x >= i and x >= k]:
                seg = per.loc[k:j]
                worst = min(worst, round(seg.yb.sum() / seg.nb.sum(), 12))
            best = max(best, worst)
        assert row.n_events == per.loc[i].nb
        assert row.n_positive == per.loc[i].yb
        assert abs(row.isotonic_rate - best) < 1e-6
    # fitted curve must be monotone non-decreasing
    assert out.sort_values("bin").isotonic_rate.is_monotonic_increasing
    # and preserve the weighted mean (PAVA property)
    tot = (out.isotonic_rate * out.n_events).sum()
    assert abs(tot - out.n_positive.sum()) < 1e-3


def test_storey_recompute(spark, sf_dir):
    out = parity.storey_qvalue_panel(spark, sf_dir).toPandas()
    bh = parity.fdr_bh_nation_uniformity(spark, sf_dir).toPandas()
    m = len(out)
    lam = parity.STOREY_LAMBDA
    pi0 = min(1.0, (out.p_value > lam).sum() / ((1 - lam) * m))
    assert abs(out.pi0.iloc[0] - pi0) < 1e-4
    # q-value = pi0 * BH adjustment, capped at 1
    j = out.merge(bh, on="n_name")
    for row in j.itertuples():
        want = min(1.0, pi0 * row.bh_adj_p)
        assert abs(row.q_value - want) < 1e-4
    assert (out.significant == (out.q_value <= parity.STOREY_Q)).all()
