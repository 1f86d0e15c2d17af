"""Tests: round-4 session-17 batch 121 — Cochran-Armitage trend,
Durbin-Watson, Friedman test."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_cochran_armitage_recompute(spark, sf_dir):
    out = parity.cochran_armitage_trend(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = pd.Series(
        ev.ts.values.astype("datetime64[us]").astype("int64"), index=ev.index
    )
    wk = (us // 86_400_000_000) // 7
    y = (ev.event_type == "purchase").astype(int)
    df = pd.DataFrame({"wk": wk, "y": y})
    per = df.groupby("wk").agg(n_i=("y", "size"), r_i=("y", "sum"))
    t = per.index - per.index.min()
    n = int(per.n_i.sum())
    r = int(per.r_i.sum())
    p = r / n
    stn = int((t * per.n_i).sum())
    st2n = int((t * t * per.n_i).sum())
    strr = int((t * per.r_i).sum())
    z = (strr - p * stn) / math.sqrt(p * (1 - p) * (st2n - stn * stn / n))
    assert (out.n_weeks, out.n_events, out.n_purchases) == (len(per), n, r)
    assert abs(out.p_hat - p) < 1e-6
    assert abs(out.z_trend - z) < 1e-6


def test_durbin_watson_recompute(spark, sf_dir):
    out = parity.durbin_watson_daily(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index().values
    n = len(y)
    i = range(1, n + 1)
    si, sii = sum(i), sum(x * x for x in i)
    sy, siy = int(y.sum()), sum(ii * yy for ii, yy in zip(i, y))
    b = (n * siy - si * sy) / (n * sii - si * si)
    a = (sy - b * si) / n
    br, ar = round(b, 12), round(a, 12)
    e = [yy - (ar + br * ii) for ii, yy in zip(i, y)]
    sse = sum(sorted(round(x * x, 12) for x in e))
    ssd = sum(
        sorted(round((x2 - x1) ** 2, 12) for x1, x2 in zip(e, e[1:]))
    )
    assert out.n_days == n
    assert abs(out.slope - b) < 1e-6
    assert abs(out.intercept - a) < 1e-6
    assert abs(out.dw_stat - ssd / sse) < 1e-6
    # DW lives in [0, 4]
    assert 0.0 <= out.dw_stat <= 4.0


def test_friedman_recompute(spark, sf_dir):
    out = parity.friedman_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    k = len(parity.FRIEDMAN_TYPES)
    ev = ev[ev.event_type.isin(parity.FRIEDMAN_TYPES)]
    users = sorted(ev.user_id.unique())
    counts = ev.groupby(["user_id", "event_type"]).size()
    s_cells = {}
    for u in users:
        vals = [
            int(counts.get((u, t), 0)) for t in parity.FRIEDMAN_TYPES
        ]
        for j, v in enumerate(vals):
            less = sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            # doubled tie-averaged rank: 2*(less+1) + ties - 1
            s_cells[(u, j)] = 2 * (less + 1) + ties - 1
    nu = len(users)
    s_j = [
        sum(s_cells[(u, j)] for u in users) for j in range(k)
    ]
    num = sum((sj - nu * (k + 1)) ** 2 for sj in s_j)
    den = sum((s - (k + 1)) ** 2 for s in s_cells.values())
    q = (k - 1) * num / den
    assert out.n_users == nu
    for j, t in enumerate(parity.FRIEDMAN_TYPES):
        assert out[f"s2_{t}"] == s_j[j]
    assert out.df == k - 1
    assert abs(out.q_stat - q) < 1e-6
    # per-block doubled ranks always sum to k(k+1)
    for u in users:
        assert sum(s_cells[(u, j)] for j in range(k)) == k * (k + 1) * 2 // 2
