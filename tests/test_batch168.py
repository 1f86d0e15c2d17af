"""Tests: round-4 session-18 batch 168 — Welch, partial corr, Bowley."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_welch_anova_recompute(spark, sf_dir):
    out = parity.welch_anova_segments(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    groups = [
        g.o_totalprice.round(2).to_numpy()
        for _, g in j.groupby("c_mktsegment")
    ]
    k = len(groups)
    ns = np.array([len(g) for g in groups], dtype=float)
    ms = np.array([g.mean() for g in groups])
    vs = np.array([g.var(ddof=1) for g in groups])
    w = ns / vs
    xt = (w * ms).sum() / w.sum()
    num = (w * (ms - xt) ** 2).sum() / (k - 1)
    lam = (((1 - w / w.sum()) ** 2) / (ns - 1)).sum()
    f = num / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    assert out.k_groups == k
    assert out.df1 == k - 1
    assert abs(out.df2 - (k * k - 1) / (3 * lam)) < 1e-2
    assert abs(out.welch_f - f) < 1e-4


def test_partial_corr_recompute(spark, sf_dir):
    out = parity.partial_correlation_panel(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li.l_quantity.round(2)
    y = li.l_extendedprice.round(2)
    z = li.l_discount.round(2)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    part = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert out.n_rows == len(li)
    assert abs(out.r_xy - rxy) < 1e-6
    assert abs(out.r_xz - rxz) < 1e-6
    assert abs(out.r_yz - ryz) < 1e-6
    assert abs(out.r_xy_given_z - part) < 1e-6


def test_bowley_recompute(spark, sf_dir):
    out = parity.bowley_skewness_panel(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for t, g in ev.groupby("event_type"):
        p10, q1, q2, q3, p90 = np.percentile(g.value, [10, 25, 50, 75, 90])
        row = out[out.event_type == t].iloc[0]
        assert row.n == len(g)
        # trap: Series.median is a METHOD — subscript access required
        assert abs(row["median"] - q2) < 1e-5
        assert abs(row.bowley_skew - (q3 + q1 - 2 * q2) / (q3 - q1)) < 1e-5
        assert (
            abs(row.quartile_dispersion - (q3 - q1) / (q3 + q1)) < 1e-5
        )
        assert abs(row.kelly_skew - (p90 + p10 - 2 * q2) / (p90 - p10)) < 1e-5
        assert -1 <= row.bowley_skew <= 1  # Bowley is bounded
