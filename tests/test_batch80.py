"""Tests: round-4 session-16 batch 80 — EQL until clause, navigation
window functions, b-bit MinHash audit."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.operators import dedup, parity


def test_eql_until_recompute(spark, sf_dir):
    out = parity.eql_sequence_until(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    span = parity.EQL_MAXSPAN_S * 10**6
    exp = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"][["event_id", "us"]].values
        purch = sorted(
            g[g.event_type == "purchase"][["us", "event_id"]].values.tolist()
        )
        errs = sorted(g[g.event_type == "error"].us.tolist())
        best = None
        for v_id, v_us in views:
            p = next(((pu, pi) for pu, pi in purch if pu > v_us), None)
            if p is None or p[0] - v_us > span:
                continue
            e1 = next((e for e in errs if e > v_us), None)
            if e1 is not None and p[0] >= e1:
                continue  # the error killed the pending head
            tup = (v_us, v_id, p[1], p[0])
            if best is None or tup < best:
                best = tup
        if best is not None:
            exp[uid] = best
    assert len(out) == len(exp)
    for r in out.itertuples():
        v_us, v_id, p_id, p_us = exp[r.user_id]
        assert (r.v_id, r.p_id, r.v_us) == (v_id, p_id, v_us)
        assert r.span_us == p_us - v_us
    # the until clause must actually kill some heads: at least one user
    # has a view->purchase chain whose head an intervening error expired
    killed = 0
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"][["event_id", "us"]].values
        purch = sorted(g[g.event_type == "purchase"].us.tolist())
        errs = sorted(g[g.event_type == "error"].us.tolist())
        for _, v_us in views:
            p = next((pu for pu in purch if pu > v_us), None)
            e1 = next((e for e in errs if e > v_us), None)
            if p is not None and e1 is not None and p >= e1:
                killed += 1
    assert killed > 0


def test_window_nav_recompute(spark, sf_dir):
    out = parity.window_nav_functions(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d_us"] = o.o_orderdate.astype("int64")
    o["tp"] = o.o_totalprice.round(2)
    assert len(out) == o.o_custkey.nunique()
    rows = {r.o_custkey: r for r in out.itertuples()}
    for cust, g in o.groupby("o_custkey"):
        g = g.sort_values(["d_us", "o_orderkey"], kind="mergesort")
        r = rows[cust]
        assert r.n_orders == len(g)
        assert abs(r.first_price - g.tp.iloc[0]) < 1e-9
        assert abs(r.last_price - g.tp.iloc[-1]) < 1e-9
        if len(g) >= 2:
            assert abs(r.second_price - g.tp.iloc[1]) < 1e-9
            gap = (g.d_us.iloc[1] - g.d_us.iloc[0]) // 86400000000
            assert r.first_to_second_days == gap
        else:
            assert pd.isna(r.second_price)
            assert pd.isna(r.first_to_second_days)


def test_bbit_minhash_recompute(spark, sf_dir):
    out = dedup.bbit_minhash_audit(spark, sf_dir).toPandas()
    truth = dedup.ngram_jaccard_pairs(spark, sf_dir).toPandas()
    sigs = dedup.minhash_signatures(spark, sf_dir).toPandas()
    sigs["bit"] = sigs.sig.str[-1].apply(lambda c: int(c, 16) % 2)
    bymap = {
        (r.doc_id, r.i): r.bit for r in sigs.itertuples()
    }
    assert len(out) == len(truth)
    k = dedup.N_MINHASH
    for r in out.itertuples():
        c = sum(
            int(bymap[(r.doc_a, i)] == bymap[(r.doc_b, i)])
            for i in range(k)
        )
        assert r.c == c
        est = max(0.0, 2.0 * c / k - 1.0)
        assert abs(r.bbit_est - est) < 5e-7
        assert abs(r.abs_err - abs(est - r.jaccard)) < 1e-6
    # identical docs must collide on every bit
    full = out[out.jaccard >= 0.999999]
    if len(full):
        assert (full.c == k).all()
