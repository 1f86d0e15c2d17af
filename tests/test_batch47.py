"""Tests: round-4 session-14 batch 47 (warehouse pack 3) — independent
pandas recomputes of the final TPC-H-shaped queries (Q2/Q9/Q11/Q12/Q15/
Q16/Q20/Q21 shapes; the full 22-query set is now covered)."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _t(sf_dir, name):
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def test_min_cost_supplier_recompute(spark, sf_dir):
    out = relational.min_cost_supplier(spark, sf_dir).toPandas()
    li, pt = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    su, na, re = _t(sf_dir, "supplier"), _t(sf_dir, "nation"), _t(sf_dir, "region")
    li = li.copy()
    li["uc"] = (li["l_extendedprice"] / li["l_quantity"]).round(6)
    cost = li.groupby(["l_partkey", "l_suppkey"])["uc"].min().reset_index()
    eu_nations = na.merge(
        re[re["r_name"] == relational.MINCOST_REGION],
        left_on="n_regionkey", right_on="r_regionkey",
    )
    supp = su.merge(eu_nations, left_on="s_nationkey", right_on="n_nationkey")
    parts = pt[
        (pt["p_type"] == relational.MINCOST_TYPE)
        & (pt["p_size"] >= relational.MINCOST_MIN_SIZE)
    ]
    j = cost.merge(parts, left_on="l_partkey", right_on="p_partkey").merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    )
    j["min_cost"] = j.groupby("p_partkey")["uc"].transform("min")
    best = j[j["uc"] == j["min_cost"]]
    assert len(out) == min(relational.MINCOST_TOP_K, len(best))
    # the rank-1 row is the max-acctbal qualifying supplier row
    top = best.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey", "s_suppkey"],
        ascending=[False, True, True, True, True],
    ).iloc[0]
    assert abs(out["s_acctbal"].iloc[0] - round(top["s_acctbal"], 2)) < 1e-9
    assert out["p_partkey"].iloc[0] == top["p_partkey"]


def test_product_type_profit_recompute(spark, sf_dir):
    out = relational.product_type_profit(spark, sf_dir).toPandas()
    li, pt = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    su, na, od = _t(sf_dir, "supplier"), _t(sf_dir, "nation"), _t(sf_dir, "orders")
    parts = pt[pt["p_name"].str.contains(relational.PROFIT_NAME_SUBSTR)]
    j = (
        li.merge(parts[["p_partkey", "p_retailprice"]],
                 left_on="l_partkey", right_on="p_partkey")
        .merge(su[["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
        .merge(na[["n_nationkey", "n_name"]],
               left_on="s_nationkey", right_on="n_nationkey")
        .merge(od[["o_orderkey", "o_orderdate"]],
               left_on="l_orderkey", right_on="o_orderkey")
    )
    j["profit"] = (
        j["l_extendedprice"] * (1.0 - j["l_discount"])
        - relational.PROFIT_COST_FACTOR * j["p_retailprice"] * j["l_quantity"]
    ).round(6)
    j["order_year"] = j["o_orderdate"].dt.year
    exp = j.groupby(["n_name", "order_year"])["profit"].agg(["sum", "size"])
    assert len(out) == len(exp)
    got = out.set_index(["nation", "order_year"])
    for (nation, year), row in exp.iterrows():
        assert abs(got.loc[(nation, year), "profit"] - round(row["sum"], 4)) < 1e-6
        assert int(got.loc[(nation, year), "n_lines"]) == int(row["size"])


def test_important_part_shares_recompute(spark, sf_dir):
    out = relational.important_part_shares(spark, sf_dir).toPandas()
    li, su, na = _t(sf_dir, "lineitem"), _t(sf_dir, "supplier"), _t(sf_dir, "nation")
    keys = set(
        su.merge(
            na[na["n_name"] == relational.IMPORTANT_NATION],
            left_on="s_nationkey", right_on="n_nationkey",
        )["s_suppkey"]
    )
    sel = li[li["l_suppkey"].isin(keys)].copy()
    sel["cents"] = (sel["l_extendedprice"] * 100.0).round(0).astype("int64")
    per = sel.groupby("l_partkey")["cents"].sum()
    total = int(per.sum())
    keep = per[per * len(per) > total * relational.IMPORTANT_SHARE_MULT]
    assert set(out["p_partkey"]) == set(keep.index)
    # values descend and equal the exact cents totals
    assert (out["value"].values[:-1] >= out["value"].values[1:]).all()
    got = dict(zip(out["p_partkey"], out["value"]))
    for pk, cents in keep.items():
        assert abs(got[pk] - cents / 100.0) < 1e-9


def test_late_lines_by_priority_recompute(spark, sf_dir):
    out = relational.late_lines_by_priority(spark, sf_dir).toPandas()
    li, od = _t(sf_dir, "lineitem"), _t(sf_dir, "orders")
    lo, hi = relational.LATE_WINDOW
    li = li[(li["l_shipdate"] >= pd.Timestamp(lo)) & (li["l_shipdate"] < pd.Timestamp(hi))]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j = j[j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=relational.WAITING_LATE_DAYS)]
    j["high"] = j["o_orderpriority"].isin(relational.LATE_PRIORITY_HIGH)
    exp = j.groupby("l_returnflag")["high"].agg(["sum", "size"])
    got = out.set_index("l_returnflag")
    for flag, row in exp.iterrows():
        assert int(got.loc[flag, "high_line_count"]) == int(row["sum"])
        assert int(got.loc[flag, "low_line_count"]) == int(row["size"] - row["sum"])


def test_top_supplier_revenue_recompute(spark, sf_dir):
    out = relational.top_supplier_revenue(spark, sf_dir).toPandas()
    li = _t(sf_dir, "lineitem")
    lo, hi = relational.TOP_SUPPLIER_QUARTER
    li = li[(li["l_shipdate"] >= pd.Timestamp(lo)) & (li["l_shipdate"] < pd.Timestamp(hi))].copy()
    li["rev"] = (li["l_extendedprice"] * (1.0 - li["l_discount"])).round(4)
    per = li.groupby("l_suppkey")["rev"].sum().round(4)
    assert set(out["s_suppkey"]) == set(per[per == per.max()].index)
    assert abs(out["total_revenue"].iloc[0] - per.max()) < 1e-6


def test_parts_supplier_count_recompute(spark, sf_dir):
    out = relational.parts_supplier_count(spark, sf_dir).toPandas()
    li, pt, su = _t(sf_dir, "lineitem"), _t(sf_dir, "part"), _t(sf_dir, "supplier")
    bad = set(su[su["s_acctbal"] < 0]["s_suppkey"])
    pairs = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    pairs = pairs[~pairs["l_suppkey"].isin(bad)]
    parts = pt[
        (pt["p_brand"] != relational.SUPPCNT_EXCL_BRAND)
        & (pt["p_type"] != relational.SUPPCNT_EXCL_TYPE)
    ]
    j = pairs.merge(parts, left_on="l_partkey", right_on="p_partkey")
    exp = j.groupby(["p_brand", "p_type"])["l_suppkey"].nunique()
    got = out.set_index(["p_brand", "p_type"])["supplier_cnt"]
    assert len(got) == len(exp)
    for key, v in exp.items():
        assert int(got.loc[key]) == int(v)


def test_promotion_part_suppliers_recompute(spark, sf_dir):
    out = relational.promotion_part_suppliers(spark, sf_dir).toPandas()
    li, pt = _t(sf_dir, "lineitem"), _t(sf_dir, "part")
    lo, hi = relational.PROMOTION_WINDOW
    keys = set(
        pt[pt["p_name"].str.startswith(relational.PROMOTION_NAME_PREFIX)]["p_partkey"]
    )
    sel = li[
        (li["l_shipdate"] >= pd.Timestamp(lo))
        & (li["l_shipdate"] < pd.Timestamp(hi))
        & li["l_partkey"].isin(keys)
    ]
    qty = sel.groupby(["l_partkey", "l_suppkey"])["l_quantity"].sum()
    exp = {int(s) for (_p, s), q in qty.items() if q > relational.PROMOTION_MIN_QTY}
    assert set(out["s_suppkey"]) == exp


def test_waiting_orders_suppliers_recompute(spark, sf_dir):
    out = relational.waiting_orders_suppliers(spark, sf_dir).toPandas()
    li, od, su = _t(sf_dir, "lineitem"), _t(sf_dir, "orders"), _t(sf_dir, "supplier")
    od = od[od["o_orderstatus"] == relational.WAITING_STATUS]
    j = li.merge(od[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                 right_on="o_orderkey")
    j["late"] = (
        j["l_shipdate"]
        > j["o_orderdate"] + pd.Timedelta(days=relational.WAITING_LATE_DAYS)
    ).astype(int)
    pair = j.groupby(["o_orderkey", "l_suppkey"])["late"].max().reset_index()
    stats = pair.groupby("o_orderkey").agg(
        n_supp=("l_suppkey", "size"), n_late=("late", "sum")
    )
    q = pair.merge(stats, on="o_orderkey")
    q = q[(q["late"] == 1) & (q["n_supp"] > 1) & (q["n_late"] == 1)]
    counts = q.groupby("l_suppkey").size()
    names = dict(zip(su["s_suppkey"], su["s_name"]))
    ranked = sorted(
        ((int(c), names[int(s)]) for s, c in counts.items()),
        key=lambda t: (-t[0], t[1]),
    )[: relational.WAITING_TOP_K]
    assert list(out["s_name"]) == [n for _c, n in ranked]
    assert list(out["numwait"]) == [c for c, _n in ranked]
