"""Tests: round-4 session-18 batch 152 — HRW balance, Palma, M/G/1."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _hrw(node, key):
    h = hashlib.md5(f"rvh:{node}:{key}".encode()).hexdigest()
    return int(h[:13], 16) * 16 + node


def test_rendezvous_recompute(spark, sf_dir):
    out = relational.rendezvous_hash_balance(spark, sf_dir).toPandas()
    keys = pd.read_parquet(f"{sf_dir}/orders.parquet").o_orderkey
    n_keys = {n: 0 for n in range(8)}
    n_moved = {n: 0 for n in range(8)}
    for k in keys:
        encs = [_hrw(n, k) for n in range(9)]
        a8 = max(encs[:8]) % 16
        n_keys[a8] += 1
        if max(encs) % 16 == 8:
            n_moved[a8] += 1
    for row in out.itertuples():
        assert row.n_keys == n_keys[row.node]
        assert row.n_moved == n_moved[row.node]
        assert abs(row.share - n_keys[row.node] / len(keys)) < 1e-6
    # HRW minimal disruption: going 8 -> 9 nodes moves ~1/9 of keys
    assert abs(out.n_moved.sum() / len(keys) - 1 / 9) < 0.05
    assert out.n_keys.sum() == len(keys)


def test_palma_recompute(spark, sf_dir):
    out = relational.palma_ratio_nations(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    name = out.n_name.iloc[0]
    sub = j[j.n_name == name].sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    )
    nn = len(sub)
    t_cut = nn - (9 * nn) // 10
    b_cut = (4 * nn) // 10
    top = sub.head(t_cut).o_totalprice.sum()
    bot = (
        sub.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[True, False]
        )
        .head(b_cut)
        .o_totalprice.sum()
    )
    row = out[out.n_name == name].iloc[0]
    assert (row.n_orders, row.top10_n, row.bottom40_n) == (nn, t_cut, b_cut)
    assert abs(row.top10_revenue - top) < 1e-6
    assert abs(row.bottom40_revenue - bot) < 1e-6
    assert abs(row.palma_ratio - top / bot) < 1e-6
    assert row.palma_ratio > 1  # top decile out-earns bottom 40% of orders


def test_mg1_recompute(spark, sf_dir):
    out = parity.mg1_waiting_time(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    span = int(us.max() - us.min())
    n = len(ev)
    lam = n * 1e6 / span
    es = ev.value.mean() / 1000
    es2 = (ev.value**2).mean() / 1e6
    rho = lam * es
    assert (out.n_events, out.span_us) == (n, span)
    assert abs(out.lambda_per_s - lam) < 1e-6
    assert abs(out.es_s - es) < 1e-6
    assert abs(out.es2_s2 - es2) < 1e-6
    assert abs(out.rho - rho) < 1e-6
    if rho < 1:
        wq = lam * es2 / (2 * (1 - rho))
        assert abs(out.wq_s - wq) < 1e-6
        assert abs(out.w_s - (wq + es)) < 1e-6
        assert abs(out.lq - lam * wq) < 1e-6
    else:
        assert pd.isna(out.wq_s)
