"""Tests: round-4 session-16 batch 103 — transition entropy rate,
next-basket baseline, order aging WIP."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_transition_entropy_recompute(spark, sf_dir):
    out = parity.transition_entropy_rate(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    trans = {}
    for _, g in ev.groupby("user_id"):
        ts = g.event_type.tolist()
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    n = sum(trans.values())
    ns = {}
    for (a, _), c in trans.items():
        ns[a] = ns.get(a, 0) + c
    h = sum(
        round(-(c / n) * math.log(c / ns[a]), 12)
        for (a, _), c in trans.items()
    )
    assert r.n_transitions == n
    assert abs(r.entropy_nats - h) < 1e-5
    assert abs(r.entropy_bits - h * 1.4426950408889634) < 1e-5
    assert abs(r.perplexity - math.exp(h)) < 1e-4
    # 5 near-uniform states: entropy must sit near ln(5)
    assert 0.8 * math.log(5) < r.entropy_nats <= math.log(5) + 1e-6


def test_next_basket_recompute(spark, sf_dir):
    out = parity.next_basket_repeat_baseline(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    baskets = li.groupby("l_orderkey").l_partkey.apply(set)
    orders["d_us"] = orders.o_orderdate.astype("int64")
    recalls = []
    for _, g in orders.groupby("o_custkey"):
        g = g.sort_values(["d_us", "o_orderkey"], kind="mergesort")
        oks = g.o_orderkey.tolist()
        for prev, nxt in zip(oks, oks[1:]):
            nb = baskets.get(nxt, set())
            if not nb:
                continue
            pb = baskets.get(prev, set())
            recalls.append(round(len(nb & pb) / len(nb), 12))
    assert r.n_pairs == len(recalls)
    assert abs(r.mean_repeat_recall - sum(recalls) / len(recalls)) < 1e-5
    # a random-assortment corpus: the baseline must be weak but nonzero
    assert 0.0 <= r.mean_repeat_recall < 0.5


def test_order_aging_recompute(spark, sf_dir):
    out = parity.order_aging_wip(spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["day"] = orders.o_orderdate.astype("int64") // 86400000000
    asof = int(orders.day.max())
    op = orders[orders.o_orderstatus == "O"].copy()
    op["bucket"] = (asof - op.day) // parity.WIP_BUCKET_DAYS
    g = op.groupby("bucket").agg(
        n=("o_totalprice", "size"),
        v=("o_totalprice", lambda s: s.round(2).sum()),
    )
    assert len(out) == len(g)
    for r in out.itertuples():
        assert r.n_orders == int(g.n[r.age_bucket])
        assert abs(r.value - round(g.v[r.age_bucket], 2)) < 0.05
    assert out.n_orders.sum() == len(op)
