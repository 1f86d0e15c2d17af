"""Tests: round-4 session-16 batch 100 — NULL semantics, circular hour
concentration, repeat purchases."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_null_semantics_recompute(spark, sf_dir):
    out = parity.null_semantics_gate(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    probe = set(ev.user_id)
    err = set(ev[ev.event_type == "error"].user_id)
    has_null = parity.NULL_SEM_UID in err
    build = err - {parity.NULL_SEM_UID} if has_null else err
    rows = dict(zip(out.formulation, out.n_rows))
    n_anti = sum(1 for u in probe if u not in build)
    assert rows["not_exists"] == n_anti
    assert rows["left_anti_join"] == n_anti
    if has_null:
        # NOT IN against a NULL-bearing list is never TRUE: zero rows
        assert rows["not_in"] == 0
        assert rows["not_exists"] > 0
    else:
        assert rows["not_in"] == n_anti


def test_circular_concentration_recompute(spark, sf_dir):
    out = parity.circular_hour_concentration(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    rows = {r.event_type: r for r in out.itertuples()}
    for et, g in ev.groupby("event_type"):
        frac = (g.us % 86400000000) / 86400000000.0
        theta = frac * parity.CIRC_TWO_PI
        cc = sum(round(math.cos(t), 12) for t in theta)
        ss = sum(round(math.sin(t), 12) for t in theta)
        r_ = math.sqrt(cc * cc + ss * ss) / len(g)
        row = rows[et]
        assert row.n == len(g)
        assert abs(row.resultant_r - r_) < 1e-5
        # synthetic times are near-uniform around the clock
        assert row.resultant_r < 0.2


def test_repeat_purchase_recompute(spark, sf_dir):
    out = parity.repeat_part_purchase_rate(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    pc = j.groupby(["l_partkey", "o_custkey"]).l_orderkey.nunique()
    per = pc.reset_index().groupby("l_partkey").agg(
        n_customers=("o_custkey", "size"),
        repeat_customers=("l_orderkey", lambda s: int((s >= 2).sum())),
    )
    exp = per.sort_values(
        ["repeat_customers", "l_partkey"], ascending=[False, True],
        kind="mergesort",
    ).head(20)
    assert len(out) == min(20, len(exp))
    for r, (pk, e) in zip(out.itertuples(), exp.iterrows()):
        assert r.l_partkey == pk
        assert r.n_customers == e.n_customers
        assert r.repeat_customers == e.repeat_customers
