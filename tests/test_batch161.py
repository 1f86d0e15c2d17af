"""Tests: round-4 session-18 batch 161 — Quade, Gumbel maxima, BH-FDR."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _month_nation_grid(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = (
        li.assign(month=li.l_shipdate.dt.strftime("%Y-%m"))
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    months = sorted(j.month.unique())[:3]
    return (
        j[j.month.isin(months)]
        .groupby(["month", "n_name"])
        .l_extendedprice.sum()
        .round(2)
        .unstack(0)
        .reindex(n.n_name)
        .fillna(0.0)
    )


def test_quade_recompute(spark, sf_dir):
    out = parity.quade_test_months(spark, sf_dir).toPandas().iloc[0]
    per = _month_nation_grid(sf_dir)
    b, k = per.shape
    r = per.rank(axis=1, method="average")
    q = (per.max(axis=1) - per.min(axis=1)).rank(method="average")
    s = r.sub((k + 1) / 2).mul(q, axis=0)
    a = (s**2).values.sum()
    bb = (s.sum(axis=0) ** 2).sum() / b
    f = (b - 1) * bb / (a - bb)
    assert (out.n_blocks, out.k_treatments) == (b, k)
    assert (out.df1, out.df2) == (k - 1, (b - 1) * (k - 1))
    assert abs(out.quade_f - f) < 1e-5


def test_gumbel_recompute(spark, sf_dir):
    out = parity.gumbel_block_maxima_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = pd.Series(0, index=range(int(ed.min()), int(ed.max()) + 1))
    vc = ed.value_counts()
    cal.loc[vc.index] = vc
    wmax = cal.groupby(cal.index // 7).max()
    mean, sd = wmax.mean(), wmax.std(ddof=1)
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(0.9))
    assert out.n_blocks == len(wmax)
    assert abs(out.max_mean - mean) < 1e-6
    assert abs(out.max_sd - sd) < 1e-6
    assert abs(out.gumbel_beta - beta) < 1e-6
    assert abs(out.gumbel_mu - mu) < 1e-5
    assert abs(out.return_level_10 - rl) < 1e-5
    assert out.return_level_10 > out.max_mean  # a return level is extreme


def test_fdr_bh_recompute(spark, sf_dir):
    out = parity.fdr_bh_nation_uniformity(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["dow"] = (j.o_orderdate.astype("int64") // 86_400_000_000) % 7
    ps = {}
    for name, g in j.groupby("n_name"):
        obs = g.dow.value_counts().reindex(range(7), fill_value=0)
        e = len(g) / 7
        x = ((obs - e) ** 2 / e).sum()
        h = x / 2
        ps[name] = round(math.exp(-h) * (1 + h + h * h / 2), 12)
    m = len(ps)
    ordered = sorted(ps.items(), key=lambda kv: (kv[1], kv[0]))
    adj = {}
    running = 1.0
    for i in range(m - 1, -1, -1):
        name, p = ordered[i]
        running = min(running, p * m / (i + 1))
        adj[name] = min(1.0, running)
    for row in out.itertuples():
        assert abs(row.p_value - ps[row.n_name]) < 1e-6
        assert abs(row.bh_adj_p - adj[row.n_name]) < 1e-6
        assert row.rejected == int(adj[row.n_name] <= parity.FDR_Q)
    # BH adjustment is monotone in p
    srt = out.sort_values("p_value")
    assert srt.bh_adj_p.is_monotonic_increasing
