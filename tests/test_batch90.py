"""Tests: round-4 session-16 batch 90 — tuning advisor, revenue
waterfall, Markov absorption."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_tuning_advisor_recompute(spark, sf_dir):
    out = relational.spark_tuning_advisor(spark, sf_dir).toPandas()
    assert len(out) == len(relational.ADVISOR_TABLES)
    for tbl in relational.ADVISOR_TABLES:
        df = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        est = 0
        for col, kind in relational.ADVISOR_SCHEMAS[tbl]:
            if kind == "string":
                est += int(df[col].astype(str).str.len().sum())
            elif kind == "floatarr":
                est += int(df[col].apply(len).sum()) * 4
            else:
                est += 8 * len(df)
        r = out[out.tbl == tbl].iloc[0]
        assert r.n_rows == len(df)
        assert r.est_bytes == est
        assert r.broadcastable == int(
            est <= relational.ADVISOR_BROADCAST_BYTES
        )
        parts = max(
            1,
            (est + relational.ADVISOR_PARTITION_BYTES - 1)
            // relational.ADVISOR_PARTITION_BYTES,
        )
        assert r.scan_partitions == parts
        assert r.task_waves == (
            parts + relational.ADVISOR_SLOTS - 1
        ) // relational.ADVISOR_SLOTS
    # the dims must come out broadcastable at test scale
    assert out[out.tbl == "region"].broadcastable.iloc[0] == 1


def test_revenue_waterfall_recompute(spark, sf_dir):
    out = relational.revenue_waterfall(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    exp = {
        "1_gross": li.l_extendedprice.round(4).sum(),
        "2_discount": (li.l_extendedprice * li.l_discount)
        .round(4)
        .sum(),
        "3_net": (li.l_extendedprice * (1 - li.l_discount))
        .round(4)
        .sum(),
        "4_tax": (
            li.l_extendedprice * (1 - li.l_discount) * li.l_tax
        )
        .round(4)
        .sum(),
        "5_charge": (
            li.l_extendedprice
            * (1 - li.l_discount)
            * (1 + li.l_tax)
        )
        .round(4)
        .sum(),
    }
    rows = dict(zip(out.component, out.amount))
    assert set(rows) == set(exp)
    for k, v in exp.items():
        assert abs(rows[k] - round(v, 2)) < 0.02
    # waterfall identities: gross = net + discount; charge = net + tax
    assert abs(rows["1_gross"] - rows["3_net"] - rows["2_discount"]) < 0.05
    assert abs(rows["5_charge"] - rows["3_net"] - rows["4_tax"]) < 0.05


def test_markov_absorption_recompute(spark, sf_dir):
    out = parity.markov_absorption_3step(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    trans = {}
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({a for a, _ in trans})
    totals = {
        s: sum(c for (a, _), c in trans.items() if a == s)
        for s in states
    }
    tm = {
        (a, b): c / totals[a] for (a, b), c in trans.items()
    }
    tgt = parity.MARKOV_TARGET
    p = {s: tm.get((s, tgt), 0.0) for s in states}
    hist = [dict(p)]
    for _ in (2, 3):
        nxt = {}
        for s in states:
            reach = sum(
                tm.get((s, sp), 0.0) * hist[-1].get(sp, 0.0)
                for sp in states
                if sp != tgt
            )
            nxt[s] = hist[0][s] + reach
        hist.append(nxt)
    assert len(out) == len(states)
    for r in out.itertuples():
        assert abs(r.p_1step - hist[0][r.start_state]) < 1e-5
        assert abs(r.p_2step - hist[1][r.start_state]) < 1e-5
        assert abs(r.p_3step - hist[2][r.start_state]) < 1e-5
        # reaching within k steps is monotone in k
        assert r.p_1step <= r.p_2step + 1e-9 <= r.p_3step + 2e-9
