"""Tests: round-4 session-18 batch 155 — p-combination, EB, jackknife."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _chi2_survival_even(x, df):
    h = x / 2
    k = df // 2
    term, s = 1.0, 1.0
    for j in range(1, k):
        term *= h / j
        s += term
    return math.exp(-h) * s


def test_pvalue_panel_recompute(spark, sf_dir):
    out = parity.pvalue_combination_panel(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["dow"] = (j.o_orderdate.astype("int64") // 86_400_000_000) % 7
    ps = []
    for _, g in j.groupby("c_mktsegment"):
        obs = g.dow.value_counts().reindex(range(7), fill_value=0)
        e = len(g) / 7
        x = ((obs - e) ** 2 / e).sum()
        ps.append(round(_chi2_survival_even(x, 6), 12))
    k = len(ps)
    fx = -2 * sum(math.log(p) for p in ps)
    assert out.k == k
    assert abs(out.fisher_x - fx) < 1e-5
    assert abs(out.fisher_p - _chi2_survival_even(fx, 2 * k)) < 1e-6
    assert abs(out.hmp - k / sum(1 / p for p in ps)) < 1e-6
    t = sum(math.tan(math.pi * (0.5 - p)) for p in ps) / k
    assert abs(out.cauchy_t - t) < 1e-4
    assert abs(out.cauchy_p - (0.5 - math.atan(t) / math.pi)) < 1e-6
    assert abs(out.bonferroni_p - min(1.0, k * min(ps))) < 1e-6


def test_eb_shrinkage_recompute(spark, sf_dir):
    out = parity.eb_shrunk_urgent_rates(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    g = j.groupby("n_name").agg(
        n_orders=("o_orderkey", "size"),
        n_urgent=("o_orderpriority", lambda s: (s == "1-URGENT").sum()),
    )
    r = (g.n_urgent / g.n_orders).round(12)
    m, v = r.mean(), r.var(ddof=1)
    ab = m * (1 - m) / v - 1
    alpha, beta = m * ab, (1 - m) * ab
    for row in out.itertuples():
        assert row.n_orders == g.loc[row.n_name].n_orders
        assert row.n_urgent == g.loc[row.n_name].n_urgent
        assert abs(row.alpha - alpha) < 1e-4
        assert abs(row.beta - beta) < 1e-4
        want = (g.loc[row.n_name].n_urgent + alpha) / (
            g.loc[row.n_name].n_orders + alpha + beta
        )
        assert abs(row.shrunk_rate - want) < 1e-5
        # shrinkage moves every rate toward the prior mean
        prior_mean = alpha / (alpha + beta)
        raw = g.loc[row.n_name].n_urgent / g.loc[row.n_name].n_orders
        assert (
            abs(row.shrunk_rate - prior_mean) <= abs(raw - prior_mean) + 1e-9
        )


def test_jackknife_recompute(spark, sf_dir):
    out = parity.jackknife_ratio_se(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    g = (li.l_shipdate.astype("int64") // 86_400_000_000) % 7
    per = li.groupby(g).agg(
        s=("l_extendedprice", "sum"), t=("l_quantity", "sum")
    )
    S, T, G = per.s.sum(), per.t.sum(), len(per)
    rgs = [(S - r.s) / (T - r.t) for r in per.itertuples()]
    rbar = sum(rgs) / G
    se = math.sqrt((G - 1) / G * sum((x - rbar) ** 2 for x in rgs))
    assert out.n_groups == G
    assert abs(out.ratio - S / T) < 1e-6
    assert abs(out.jk_mean - rbar) < 1e-6
    assert abs(out.jk_se - se) < 1e-6
    assert abs(out.jk_bias - (G - 1) * (rbar - S / T)) < 1e-6
