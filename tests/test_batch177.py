"""Tests: round-4 session-18 batch 177 — ARCH-LM, turning pts, NW SE."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    return np.array(
        ed.value_counts().reindex(cal, fill_value=0).sort_index(),
        dtype=float,
    )


def test_arch_lm_recompute(spark, sf_dir):
    out = parity.arch_lm_test(spark, sf_dir).toPandas().iloc[0]
    y = _daily(sf_dir)
    e2 = np.diff(y) ** 2
    x, yy = e2[:-1], e2[1:]
    r = np.corrcoef(x, yy)[0, 1]
    n = len(x)
    assert out.n_pairs == n
    assert abs(out.r_squared - r * r) < 1e-5
    assert abs(out.arch_lm_stat - n * r * r) < 1e-3
    assert out.reject_at_05 == int(n * r * r > 3.841)


def test_turning_point_recompute(spark, sf_dir):
    out = parity.turning_point_test(spark, sf_dir).toPandas().iloc[0]
    y = _daily(sf_dir)
    n = len(y)
    t = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    et = 2 * (n - 2) / 3
    vt = (16 * n - 29) / 90
    assert out.n_days == n
    assert out.turning_points == t
    assert abs(out.expected - et) < 1e-6
    assert abs(out.z_stat - (t - et) / math.sqrt(vt)) < 1e-5


def test_newey_west_recompute(spark, sf_dir):
    out = parity.newey_west_se(spark, sf_dir).toPandas().iloc[0]
    y = _daily(sf_dir)
    n = len(y)
    mu = y.mean()
    g0 = ((y - mu) ** 2).sum() / n
    lrv = g0
    for k in range(1, parity.NW_LAGS + 1):
        gk = ((y[:-k] - mu) * (y[k:] - mu)).sum() / n
        lrv += 2 * (1 - k / (parity.NW_LAGS + 1)) * gk
    assert out.n_days == n
    assert abs(out.mean_count - mu) < 1e-6
    assert abs(out.gamma0 - g0) < 1e-4
    assert abs(out.long_run_var - lrv) < 1e-3
    assert abs(out.naive_se - math.sqrt(g0 / n)) < 1e-5
    assert abs(out.newey_west_se - math.sqrt(lrv / n)) < 1e-5
    # positive dependence widens the HAC SE (or leaves it comparable)
    assert out.newey_west_se > 0
