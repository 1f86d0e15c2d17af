"""Tests: round-4 session-16 batch 85 — constraint suite, data profile
audit, any-order funnel."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_constraint_suite_recompute(spark, sf_dir):
    out = parity.constraint_check_suite(spark, sf_dir).toPandas()
    rows = {r.check_name: r for r in out.itertuples()}
    assert len(rows) == 6
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    lineitem = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")
    events = pd.read_parquet(f"{sf_dir}/events.parquet")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    dup = orders.o_orderkey.value_counts()
    assert rows["orders_pk_unique"].n_violations == int(
        (dup[dup > 1] - 1).sum()
    )
    assert rows["orders_custkey_fk"].n_violations == int(
        (~orders.o_custkey.isin(customer.c_custkey)).sum()
    )
    assert rows["lineitem_orderkey_fk"].n_violations == int(
        (~lineitem.l_orderkey.isin(orders.o_orderkey)).sum()
    )
    assert rows["events_value_nonnegative"].n_violations == int(
        (events.value < 0).sum()
    )
    assert rows["events_user_id_not_null"].n_violations == int(
        events.user_id.isna().sum()
    )
    assert rows["documents_n_chars_consistent"].n_violations == int(
        (docs.n_chars != docs.text.str.len()).sum()
    )
    for r in rows.values():
        assert r.passed == int(r.n_violations == 0)
    # the synthetic warehouse is referentially sound by construction
    assert rows["orders_custkey_fk"].passed == 1
    assert rows["lineitem_orderkey_fk"].passed == 1


def test_data_profile_recompute(spark, sf_dir):
    out = parity.data_profile_audit(spark, sf_dir).toPandas()
    assert len(out) == len(parity.PROFILE_COLS)
    for tbl, col in parity.PROFILE_COLS:
        df = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        r = out[(out.tbl == tbl) & (out.col == col)].iloc[0]
        assert r.n_rows == len(df)
        assert r.n_null == int(df[col].isna().sum())
        assert r.n_nan == int(np.isnan(df[col].fillna(0)).sum())
        assert abs(r.min_v - round(df[col].min(), 6)) < 1e-9
        assert abs(r.max_v - round(df[col].max(), 6)) < 1e-9


def test_any_order_funnel_recompute(spark, sf_dir):
    out = parity.any_order_funnel(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type.isin(parity.ANY_ORDER_TYPES)].copy()
    ev["us"] = ev.ts.astype("int64")
    w = parity.ANY_ORDER_WINDOW_S * 10**6
    n_any = n_ord = 0
    for uid, g in ev.groupby("user_id"):
        by_t = {
            t: sorted(g[g.event_type == t].us.tolist())
            for t in parity.ANY_ORDER_TYPES
        }
        hit = False
        for a in g.us:
            if all(
                any(a <= x <= a + w for x in by_t[t])
                for t in parity.ANY_ORDER_TYPES
            ):
                hit = True
                break
        n_any += int(hit)
        ordered = False
        for v_us in by_t["view"]:
            c = next((x for x in by_t["click"] if x > v_us), None)
            if c is None:
                continue
            if any(
                x > c and x - v_us <= w for x in by_t["purchase"]
            ):
                ordered = True
                break
        n_ord += int(ordered)
    assert r.n_users == ev.user_id.nunique()
    assert r.n_any_order == n_any
    assert r.n_ordered == n_ord
    # any-order is a superset condition of ordered completion
    assert r.n_any_order >= r.n_ordered
