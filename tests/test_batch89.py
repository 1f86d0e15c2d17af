"""Tests: round-4 session-16 batch 89 — Welford merge audit, correlated
subquery gate, Hurst exponent."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_welford_merge_recompute(spark, sf_dir):
    out = parity.welford_merge_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    acc = (0, 0.0, 0.0)
    for _, g in sorted(d.groupby("source"), key=lambda kv: kv[0]):
        n = len(g)
        sx = int(g.n_chars.sum())
        sxx = int((g.n_chars.astype("int64") ** 2).sum())
        m = sx / n
        m2 = sxx - n * m * m
        an, am, am2 = acc
        nn = an + n
        acc = (
            nn,
            (an * am + n * m) / nn,
            am2 + m2 + (m - am) ** 2 * an * n / nn,
        )
    v = d.n_chars.astype("int64")
    n = len(v)
    direct = float(
        (int((v * v).sum()) - n * (int(v.sum()) / n) ** 2) / (n - 1)
    )
    assert r.n == n
    assert abs(r.var_merged - acc[2] / (acc[0] - 1)) < 1e-4
    assert abs(r.var_direct - direct) < 1e-4
    # the merge algebra must agree with the direct formula to 6dp
    assert r.abs_diff < 1e-4


def test_correlated_subquery_recompute(spark, sf_dir):
    out = parity.correlated_subquery_gate(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["tp"] = o.o_totalprice.round(2)
    rows = []
    for cust, g in o.groupby("o_custkey"):
        avg = g.tp.mean()
        above = g[g.tp > avg]
        if len(above):
            rows.append((cust, len(above), round(above.tp.min(), 2)))
    rows.sort(key=lambda t: (-t[1], t[0]))
    rows = rows[:20]
    assert len(out) == len(rows)
    for r, (cust, n, mn) in zip(out.itertuples(), rows):
        assert (r.o_custkey, r.n_above) == (cust, n)
        assert abs(r.min_above_price - mn) < 5e-3


def test_hurst_recompute(spark, sf_dir):
    out = parity.hurst_exponent_daily(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    eday = ev.ts.astype("int64") // 86400000000
    counts = eday.value_counts().sort_index()
    idx = np.arange(counts.index.min(), counts.index.max() + 1)
    y = counts.reindex(idx, fill_value=0).values.astype(float)
    pts = []
    for wsize in parity.HURST_WINDOWS:
        rss = []
        for b in range(len(y) // wsize):
            blk = y[b * wsize : (b + 1) * wsize]
            m = blk.sum() / wsize
            s = math.sqrt(
                (np.sum(blk * blk) - wsize * m * m) / (wsize - 1)
            )
            if s <= 0:
                continue
            c = np.cumsum(blk - m)
            rss.append(round((c.max() - c.min()) / s, 6))
        mean_rs = round(sum(rss) / len(rss), 6)
        r = out[out.window_d == wsize].iloc[0]
        assert r.n_blocks == len(rss)
        assert abs(r.mean_rs - mean_rs) < 1e-5
        pts.append((math.log(wsize), math.log(mean_rs)))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert (out.hurst.nunique()) == 1
    assert abs(out.hurst.iloc[0] - h) < 1e-4
    # daily event counts are near-white noise: H should sit around 0.5
    assert 0.1 < out.hurst.iloc[0] < 0.95
