"""Tests: round-4 session-18 batch 150 — VWAP/TWAP, FD bins,
bias-corrected Cramer's V."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_vwap_twap_recompute(spark, sf_dir):
    out = relational.vwap_twap_monthly(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(month=li.l_shipdate.dt.strftime("%Y-%m"))
    m = li.month.iloc[0]
    sub = li[li.month == m]
    vwap = sub.l_extendedprice.sum() / sub.l_quantity.sum()
    daily = (
        sub.assign(up=sub.l_extendedprice / sub.l_quantity)
        .groupby(sub.l_shipdate.dt.normalize())
        .up.mean()
    )
    twap = daily.mean()
    row = out[out.month == m].iloc[0]
    assert row.n_lines == len(sub)
    assert row.n_days == daily.size
    assert abs(row.vwap - vwap) < 1e-4
    assert abs(row.twap - twap) < 1e-4
    assert abs(row.vwap_over_twap - row.vwap / row.twap) < 1e-6
    assert list(out.month) == sorted(out.month)


def test_fd_binwidth_recompute(spark, sf_dir):
    out = parity.fd_binwidth_recommendation(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").o_totalprice
    q1, q3 = np.percentile(o, [25, 75])
    width = 2 * (q3 - q1) / len(o) ** (1.0 / 3.0)
    assert out.n == len(o)
    assert abs(out.iqr - (q3 - q1)) < 1e-5
    assert abs(out.value_range - (o.max() - o.min())) < 1e-5
    assert abs(out.fd_binwidth - width) < 1e-4
    assert out.n_bins == math.floor((o.max() - o.min()) / width) + 1


def test_cramers_v_corrected_recompute(spark, sf_dir):
    out = parity.cramers_v_bias_corrected(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tab = pd.crosstab(docs.lang, docs.source)
    n = tab.values.sum()
    r, c = tab.shape
    e = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = ((tab.values - e) ** 2 / e).sum()
    phi2 = chi2 / n
    phi2t = max(phi2 - (r - 1) * (c - 1) / (n - 1), 0.0)
    rt = r - (r - 1) ** 2 / (n - 1)
    ct = c - (c - 1) ** 2 / (n - 1)
    v = math.sqrt(phi2t / min(rt - 1, ct - 1))
    assert (out.n, out.r, out.c) == (n, r, c)
    assert abs(out.chi2 - chi2) < 1e-5
    assert abs(out.phi2 - phi2) < 1e-6
    assert abs(out.cramers_v_corrected - v) < 1e-6
    assert 0 <= out.cramers_v_corrected <= 1
