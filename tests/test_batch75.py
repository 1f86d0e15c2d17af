"""Tests: round-4 session-16 batch 75 — the experimentation pack
(A/B power analysis, difference-in-differences, one-way ANOVA)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_ab_power_recompute(spark, sf_dir):
    out = parity.ab_power_analysis(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.astype("int64") // 86400000000
    ud = ev.groupby(["user_id", "day"]).event_type.apply(
        lambda g: int((g == "purchase").any())
    )
    user_days, conv_days = len(ud), int(ud.sum())
    n_days = ev.day.nunique()
    assert r.user_days == user_days and r.conv_days == conv_days
    p1 = conv_days / user_days
    p2 = p1 + parity.AB_MDE
    pbar = (p1 + p2) / 2.0
    root = parity.AB_Z_ALPHA * math.sqrt(
        2.0 * pbar * (1.0 - pbar)
    ) + parity.AB_Z_BETA * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    req = math.ceil(root * root / (parity.AB_MDE * parity.AB_MDE))
    assert r.required_per_arm == req
    assert r.required_total == 2 * req
    avg_daily = user_days / n_days
    assert abs(r.avg_daily_users - avg_daily) < 5e-7
    assert r.days_needed == math.ceil(2 * req / avg_daily)
    # the formula only makes sense while both rates live inside (0,1)
    assert 0.0 < p1 < p2 < 1.0


def test_did_recompute(spark, sf_dir):
    out = parity.did_estimate(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type == "purchase"].copy()
    ev["t"] = [
        _md5_52(f"{u}:did") % 2 for u in ev.user_id.astype("int64")
    ]
    ev["p"] = (ev.ts.astype("int64") >= parity.DID_SPLIT_US).astype(int)
    ev["v"] = ev.value.round(6)
    means = {}
    for (t, p), g in ev.groupby(["t", "p"]):
        means[(t, p)] = g.v.sum() / len(g)
        n_col = {
            (1, 0): "n_t_pre",
            (1, 1): "n_t_post",
            (0, 0): "n_c_pre",
            (0, 1): "n_c_post",
        }[(t, p)]
        assert r[n_col] == len(g)
    assert abs(r.mean_t_pre - means[(1, 0)]) < 5e-6
    assert abs(r.mean_t_post - means[(1, 1)]) < 5e-6
    assert abs(r.mean_c_pre - means[(0, 0)]) < 5e-6
    assert abs(r.mean_c_post - means[(0, 1)]) < 5e-6
    did = (means[(1, 1)] - means[(1, 0)]) - (
        means[(0, 1)] - means[(0, 0)]
    )
    assert abs(r.did - did) < 1e-5


def test_anova_recompute(spark, sf_dir):
    out = parity.anova_event_value(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["v"] = ev.value.round(6)
    g = ev.groupby("event_type").v.agg(["count", "sum", "mean"])
    k, n = len(g), len(ev)
    assert r.k == k and r.n_tot == n
    grand = g["sum"].sum() / n
    ssb = (g["count"] * (g["mean"] - grand) ** 2).sum()
    ssw = sum(
        ((gr.v - gr.v.mean()) ** 2).sum()
        for _, gr in ev.groupby("event_type")
    )
    assert abs(r.ssb - ssb) < 1e-3
    assert abs(r.ssw - ssw) < 1e-2
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r.f_stat - f) < 1e-4
    # with md5-noise values the between-group signal should be weak
    assert r.f_stat >= 0.0
