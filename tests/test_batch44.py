"""Tests: round-4 session-14 batch 44 (warehouse pack 2) — independent
pandas recomputes of the remaining TPC-H-shaped queries."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _li(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def _cust(sf_dir):
    return pd.read_parquet(f"{sf_dir}/customer.parquet")


def _part(sf_dir):
    return pd.read_parquet(f"{sf_dir}/part.parquet")


def test_shipping_priority_recompute(spark, sf_dir):
    out = relational.shipping_priority_topk(spark, sf_dir).toPandas()
    li, od, cu = _li(sf_dir), _orders(sf_dir), _cust(sf_dir)
    cut = pd.Timestamp(relational.SHIP_CUTOFF)
    keys = set(cu[cu["c_mktsegment"] == relational.SHIP_SEGMENT]["c_custkey"])
    od = od[(od["o_orderdate"] < cut) & od["o_custkey"].isin(keys)]
    li = li[li["l_shipdate"] > cut]
    j = li.merge(od[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    j["rev"] = (j["l_extendedprice"] * (1.0 - j["l_discount"])).round(4)
    agg = j.groupby("o_orderkey")["rev"].sum().sort_values(ascending=False)
    assert len(out) == min(relational.SHIP_TOP_K, len(agg))
    # top revenue value and membership agree (ties broken by orderkey)
    assert abs(out["revenue"].iloc[0] - round(agg.iloc[0], 4)) < 1e-6
    assert set(out["o_orderkey"]) <= set(agg.head(len(out) + 5).index)


def test_forecast_revenue_recompute(spark, sf_dir):
    out = relational.forecast_revenue_delta(spark, sf_dir).toPandas()
    li = _li(sf_dir)
    lo, hi = relational.FORECAST_WINDOW
    dlo, dhi = relational.FORECAST_DISCOUNT
    sel = li[
        (li["l_shipdate"] >= pd.Timestamp(lo))
        & (li["l_shipdate"] < pd.Timestamp(hi))
        & (li["l_discount"] >= dlo)
        & (li["l_discount"] <= dhi)
        & (li["l_quantity"] < relational.FORECAST_MAX_QTY)
    ]
    exp = (sel["l_extendedprice"] * sel["l_discount"]).round(4).sum()
    assert int(out["n_lines"].iloc[0]) == len(sel)
    assert abs(out["revenue_delta"].iloc[0] - round(exp, 4)) < 1e-6


def test_customer_order_histogram_recompute(spark, sf_dir):
    out = relational.customer_order_histogram(spark, sf_dir).toPandas()
    od, cu = _orders(sf_dir), _cust(sf_dir)
    od = od[od["o_orderpriority"] != relational.HIST_EXCLUDE_PRIORITY]
    counts = od.groupby("o_custkey").size()
    per_cust = cu["c_custkey"].map(counts).fillna(0).astype(int)
    exp = per_cust.value_counts()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {int(k): int(v) for k, v in exp.items()}
    assert int(out["custdist"].sum()) == len(cu)


def test_promo_share_recompute(spark, sf_dir):
    out = relational.promo_revenue_share(spark, sf_dir).toPandas()
    li, pt = _li(sf_dir), _part(sf_dir)
    lo, hi = relational.PROMO_WINDOW
    li = li[(li["l_shipdate"] >= pd.Timestamp(lo)) & (li["l_shipdate"] < pd.Timestamp(hi))]
    j = li.merge(pt[["p_partkey", "p_type"]], left_on="l_partkey", right_on="p_partkey")
    j["rev"] = (j["l_extendedprice"] * (1.0 - j["l_discount"])).round(4)
    promo = j[j["p_type"] == "PROMO"]["rev"].sum()
    total = j["rev"].sum()
    assert abs(out["promo_pct"].iloc[0] - round(100.0 * promo / total, 6)) < 1e-5


def test_small_qty_recompute(spark, sf_dir):
    out = relational.small_qty_order_revenue(spark, sf_dir).toPandas()
    li, pt = _li(sf_dir), _part(sf_dir)
    keys = set(pt[pt["p_brand"] == relational.SMALLQTY_BRAND]["p_partkey"])
    bl = li[li["l_partkey"].isin(keys)]
    avg = bl.groupby("l_partkey")["l_quantity"].mean()
    sel = bl[bl["l_quantity"] < relational.SMALLQTY_FRACTION * bl["l_partkey"].map(avg)]
    assert int(out["n_lines"].iloc[0]) == len(sel)
    exp = sel["l_extendedprice"].round(2).sum() / 7.0
    assert abs(out["avg_yearly"].iloc[0] - round(exp, 4)) < 1e-6


def test_disjunctive_filter_recompute(spark, sf_dir):
    out = relational.disjunctive_filter_revenue(spark, sf_dir).toPandas()
    li, pt = _li(sf_dir), _part(sf_dir)
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    mask = False
    for brand, qlo, qhi, slo, shi in relational.DISJUNCT_CLAUSES:
        mask = mask | (
            (j["p_brand"] == brand)
            & (j["l_quantity"] >= qlo) & (j["l_quantity"] <= qhi)
            & (j["p_size"] >= slo) & (j["p_size"] <= shi)
        )
    sel = j[mask]
    assert int(out["n_lines"].iloc[0]) == len(sel)


def test_dormant_customer_recompute(spark, sf_dir):
    out = relational.dormant_customer_balance(spark, sf_dir).toPandas()
    cu, od = _cust(sf_dir), _orders(sf_dir)
    segs = cu[cu["c_mktsegment"].isin(relational.DORMANT_SEGMENTS)]
    avg = segs[segs["c_acctbal"] > 0.0]["c_acctbal"].round(2).sum() / len(
        segs[segs["c_acctbal"] > 0.0]
    )
    recent = set(
        od[od["o_orderdate"] >= pd.Timestamp(relational.DORMANT_CUTOFF)]["o_custkey"]
    )
    dorm = segs[(segs["c_acctbal"] > avg) & ~segs["c_custkey"].isin(recent)]
    exp = dorm.groupby("c_mktsegment").size().to_dict()
    got = dict(zip(out["c_mktsegment"], out["n_custs"]))
    assert got == {k: int(v) for k, v in exp.items()}
