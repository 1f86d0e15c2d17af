"""Tests: round-4 session-18 batch 183 — Weibull, extremal index, CV."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def test_weibull_recompute(spark, sf_dir):
    out = relational.weibull_plot_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    us = ev.ts.astype("int64")
    gaps = []
    for _, g in us.groupby(ev.user_id):
        d = g.diff().dropna()
        gaps.extend(int(x) for x in d if x > 0)
    gaps.sort()
    n = len(gaps)
    u = np.log(gaps)
    y = np.log(
        -np.log(1 - (np.arange(1, n + 1) - 0.3) / (n + 0.4))
    )
    k, icpt = np.polyfit(u, y, 1)
    assert out.n_gaps == n
    assert abs(out.weibull_shape_k - k) < 1e-4
    assert abs(out.weibull_scale_us - math.exp(-icpt / k)) < max(
        1e-2, out.weibull_scale_us * 1e-4
    )
    assert out.bursty == int(k < 1)


def test_extremal_index_recompute(spark, sf_dir):
    out = relational.extremal_index_runs(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = pd.Series(0, index=range(int(ed.min()), int(ed.max()) + 1))
    vc = ed.value_counts()
    cal.loc[vc.index] = vc
    u = np.percentile(cal, 90)
    exc = sorted(d for d, c in cal.items() if c > u)
    clusters = sum(
        1
        for i, d in enumerate(exc)
        if i == 0 or d - exc[i - 1] > relational.EXTREMAL_RUN_GAP
    )
    assert abs(out.threshold - u) < 1e-5
    assert out.n_exceedances == len(exc)
    assert out.n_clusters == clusters
    assert abs(out.extremal_index - clusters / len(exc)) < 1e-6
    assert 0 < out.extremal_index <= 1


def test_price_dispersion_recompute(spark, sf_dir):
    out = relational.unit_price_dispersion_topk(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    up = (li.l_extendedprice / li.l_quantity).round(6)
    rows = []
    for pk, g in up.groupby(li.l_partkey):
        if len(g) >= relational.PRICE_DISP_MIN_LINES:
            cv = round(g.std(ddof=1) / g.mean(), 6)
            rows.append((pk, len(g), round(g.mean(), 6), cv))
    rows.sort(key=lambda r: (-r[3], r[0]))
    for i, row in enumerate(out.itertuples()):
        pk, n, m, cv = rows[i]
        assert row.l_partkey == pk
        assert row.n_lines == n
        assert abs(row.mean_unit_price - m) < 1e-5
        assert abs(row.cv - cv) < 1e-6
        assert row.rank == i + 1
