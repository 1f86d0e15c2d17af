"""Tests: round-4 session-16 batch 87 — funnel step latency, basket
size stats, SLO burn alerts."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_funnel_latency_recompute(spark, sf_dir):
    out = parity.funnel_step_latency_matrix(spark, sf_dir).toPandas()
    chains = parity.eql_sequence_match(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cus = dict(zip(ev.event_id, ev.ts.astype("int64")))
    g_vc = [(cus[r.c_id] - r.v_us) / 1e6 for r in chains.itertuples()]
    g_cp = [
        (r.v_us + r.span_us - cus[r.c_id]) / 1e6
        for r in chains.itertuples()
    ]
    g_vp = [r.span_us / 1e6 for r in chains.itertuples()]
    rows = {r.step: r for r in out.itertuples()}
    for step, vals in (
        ("view_to_click", g_vc),
        ("click_to_purchase", g_cp),
        ("view_to_purchase", g_vp),
    ):
        r = rows[step]
        assert r.n_chains == len(vals)
        assert abs(r.p50_s - float(np.quantile(vals, 0.5))) < 1e-4
        assert abs(r.p90_s - float(np.quantile(vals, 0.9))) < 1e-4
        assert abs(r.max_s - max(vals)) < 1e-6
    # gaps must compose: vc + cp == vp per chain, so maxes bound the sum
    assert rows["view_to_purchase"].max_s <= (
        rows["view_to_click"].max_s + rows["click_to_purchase"].max_s
    ) + 1e-6


def test_basket_size_recompute(spark, sf_dir):
    out = parity.basket_size_stats(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["rev"] = (li.l_extendedprice * (1.0 - li.l_discount)).round(4)
    per = li.groupby("l_orderkey").agg(
        n_items=("rev", "size"), orev=("rev", "sum")
    )
    g = per.groupby("n_items").agg(
        n_orders=("orev", "size"), mean_rev=("orev", "mean")
    )
    assert len(out) == len(g)
    for r in out.itertuples():
        assert r.n_orders == int(g.n_orders[r.n_items])
        assert abs(r.mean_revenue - g.mean_rev[r.n_items]) < 1e-3
    assert out.n_orders.sum() == per.shape[0]


def test_slo_burn_recompute(spark, sf_dir):
    out = parity.slo_burn_alerts(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    eh = ev.ts.astype("int64") // 3600000000
    err = eh[ev.event_type == "error"]
    lo, hi = eh.min(), eh.max()
    idx = np.arange(lo, hi + 1)
    n = eh.value_counts().reindex(idx, fill_value=0).values
    ne = err.value_counts().reindex(idx, fill_value=0).values
    sh, lg = parity.SLO_WINDOWS_H
    exp_rows = []
    for i in range(lg - 1, len(idx)):
        ns, nes = n[i - sh + 1 : i + 1].sum(), ne[i - sh + 1 : i + 1].sum()
        nl, nel = n[i - lg + 1 : i + 1].sum(), ne[i - lg + 1 : i + 1].sum()
        if ns == 0 or nl == 0:
            continue
        bs = nes / ns / parity.SLO_ERROR_BUDGET
        bl = nel / nl / parity.SLO_ERROR_BUDGET
        exp_rows.append(
            (
                idx[i],
                nes / ns,
                nel / nl,
                int(
                    bs > parity.SLO_BURN_THRESHOLD
                    and bl > parity.SLO_BURN_THRESHOLD
                ),
            )
        )
    assert len(out) == len(exp_rows)
    for r, (h, rs, rl, page) in zip(out.itertuples(), exp_rows):
        assert r.eh == h
        assert abs(r.rate_short - rs) < 5e-7
        assert abs(r.rate_long - rl) < 5e-7
        assert r.page == page
