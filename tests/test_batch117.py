"""Tests: round-4 session-17 batch 117 — Ljung-Box Q, sign-flip
permutation test, Theil's U2."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _daily_counts(sf_dir: str) -> np.ndarray:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    counts = days.value_counts()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    return np.array([int(counts.get(d, 0)) for d in cal], dtype=np.int64)


def test_ljung_box_recompute(spark, sf_dir):
    out = parity.ljung_box_q(spark, sf_dir).toPandas()
    x = _daily_counts(sf_dir).astype(float)
    n = len(x)
    m = x.mean()
    den = ((x - m) ** 2).sum()
    q = 0.0
    assert len(out) == parity.LB_MAX_LAG
    for row in out.itertuples():
        lag = row.lag
        rho = ((x[lag:] - m) * (x[:-lag] - m)).sum() / den
        q += round(rho * rho / (n - lag), 12)
        assert row.n_pairs == n - lag
        assert abs(row.rho - rho) < 1e-5
        assert abs(row.q_stat - n * (n + 2) * q) < 1e-3
    # the weekly cycle should make Q grow strongly significant
    assert out.q_stat.iloc[-1] > out.q_stat.iloc[0] > 0


def _u52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_signflip_recompute(spark, sf_dir):
    out = parity.permutation_test_signflip(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["v"] = ev.value.round(6)
    epoch_day = (ev.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    ev["sgn"] = np.where(epoch_day % 2 == 0, 1.0, -1.0)
    # exact decimal bookkeeping in integer micro-units
    d = (
        (ev.v * 1_000_000).round().astype("int64") * ev.sgn.astype("int64")
    ).groupby(ev.user_id).sum()
    t_obs = int(d.sum())
    assert out.n_units == len(d)
    assert out.b_perms == parity.SIGNFLIP_B
    assert abs(out.t_obs - t_obs / 1e6) < 1e-6
    n_ext = 0
    users = list(d.index)
    dv = d.values
    for b in range(1, parity.SIGNFLIP_B + 1):
        s = np.array(
            [
                1 if _u52(f"{u}:{b}:sgnflip") * 2 < (1 << 52) else -1
                for u in users
            ],
            dtype=np.int64,
        )
        tb = int((s * dv).sum())
        if abs(tb) >= abs(t_obs):
            n_ext += 1
    assert out.n_extreme == n_ext
    assert abs(out.p_value - (1 + n_ext) / (parity.SIGNFLIP_B + 1)) < 1e-6


def test_theil_u2_recompute(spark, sf_dir):
    out = parity.theil_u2_forecast(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    rev_u = (
        (ev.value.round(6) * 1_000_000)
        .round()
        .astype("int64")
        .groupby(ev.ts.dt.normalize())
        .sum()
        .sort_index()
    )
    a = (rev_u / 1e6).values
    n = len(a)
    assert out.n_days == n
    s_model = s_naive = 0.0
    n_terms = 0
    for t in range(7, n):
        if a[t - 1] == 0.0:
            continue
        n_terms += 1
        s_model += round(((a[t - 7] - a[t]) / a[t - 1]) ** 2, 12)
        s_naive += round(((a[t] - a[t - 1]) / a[t - 1]) ** 2, 12)
    assert out.n_terms == n_terms
    assert abs(out.ss_model - s_model) < 1e-6
    assert abs(out.ss_naive - s_naive) < 1e-6
    assert abs(out.u2 - math.sqrt(s_model / s_naive)) < 1e-5
    assert out.u2 > 0
