"""Tests: round-4 session-18 batch 181 — RD, retention decay, ABC."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def test_rd_recompute(spark, sf_dir):
    out = relational.regression_discontinuity(spark, sf_dir).toPandas().iloc[
        0
    ]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = li.groupby("l_orderkey").size()
    j = o[o.o_orderkey.isin(y.index)].assign(
        x=o.o_totalprice.round(2), yv=lambda d: y[d.o_orderkey].values
    )
    c, h = relational.RD_CUTOFF, relational.RD_BANDWIDTH
    j = j[(j.x >= c - h) & (j.x < c + h)]
    j["u"] = (j.x - c) / h
    left = j[j.x < c]
    right = j[j.x >= c]
    bl, al = np.polyfit(left.u, left.yv, 1)
    br, ar = np.polyfit(right.u, right.yv, 1)
    assert (out.n_left, out.n_right) == (len(left), len(right))
    assert abs(out.slope_left - bl) < 1e-4
    assert abs(out.slope_right - br) < 1e-4
    assert abs(out.intercept_left - al) < 1e-4
    assert abs(out.intercept_right - ar) < 1e-4
    assert abs(out.rd_effect - (round(ar, 6) - round(al, 6))) < 1e-6
    # no real treatment exists at the cutoff: effect should be small
    assert abs(out.rd_effect) < 2.0


def test_retention_decay_recompute(spark, sf_dir):
    out = relational.retention_decay_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    wk = ev.ts.astype("int64") // 86_400_000_000 // 7
    per = pd.DataFrame({"u": ev.user_id, "wk": wk}).drop_duplicates()
    w0 = per.groupby("u").wk.min()
    per["off"] = per.wk - per.u.map(w0)
    n_users = per.u.nunique()
    rates = (
        per[per.off >= 1].groupby("off").u.nunique() / n_users
    )
    assert out.n_week_offsets == len(rates)
    us = rates.index.to_numpy(dtype=float)
    ws = np.log(rates.to_numpy())
    if len(us) >= 2 and np.ptp(us) > 0:
        b, a = np.polyfit(us, ws, 1)
        if abs(b) > 1e-12:
            assert abs(out.decay_slope - b) < 1e-4
        if b < 0:
            assert abs(out.half_life_weeks - (-math.log(2) / b)) < 1e-2
        else:
            assert pd.isna(out.half_life_weeks)
    else:
        assert pd.isna(out.decay_slope)


def test_abc_recompute(spark, sf_dir):
    out = relational.abc_classification(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    per = (
        li.groupby("l_partkey")
        .l_extendedprice.apply(lambda s: s.round(2).sum())
        .reset_index(name="rev")
        .sort_values(["rev", "l_partkey"], ascending=[False, True])
    )
    t = per.rev.sum()
    per["cum"] = per.rev.cumsum()
    per["abc"] = np.where(
        per.cum / t <= 0.80, "A", np.where(per.cum / t <= 0.95, "B", "C")
    )
    g = per.groupby("abc").agg(n=("rev", "size"), r=("rev", "sum"))
    for row in out.itertuples():
        assert row.n_parts == g.loc[row.abc].n
        assert abs(row.part_share - g.loc[row.abc].n / len(per)) < 1e-6
        assert abs(row.revenue_share - g.loc[row.abc].r / t) < 1e-6
    # A parts are few but carry most revenue
    a = out[out.abc == "A"].iloc[0]
    assert a.revenue_share > a.part_share
