"""Tests: round-4 session-13 batch 37 (warehouse-relational pack) —
independent pandas recomputes of the TPC-H-shaped queries."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _li(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_pricing_summary_recompute(spark, sf_dir):
    out = relational.pricing_summary(spark, sf_dir).toPandas()
    li = _li(sf_dir)
    li = li[li["l_shipdate"] <= pd.Timestamp(relational.PRICING_CUTOFF)]
    grp = li.groupby(["l_returnflag", "l_linestatus"])
    assert len(out) == grp.ngroups
    for row in out.itertuples():
        g = grp.get_group((row.l_returnflag, row.l_linestatus))
        assert row.sum_qty == int(g["l_quantity"].sum())
        assert row.n_lines == len(g)
        disc_price = g["l_extendedprice"] * (1.0 - g["l_discount"])
        assert abs(row.sum_disc_price - round(disc_price.round(4).sum(), 4)) < 1e-6
        charge = disc_price * (1.0 + g["l_tax"])
        assert abs(row.sum_charge - round(charge.round(6).sum(), 6)) < 1e-6
        assert abs(row.avg_qty - g["l_quantity"].sum() / len(g)) < 1e-6


def test_order_priority_count_recompute(spark, sf_dir):
    out = relational.order_priority_count(spark, sf_dir).toPandas()
    od, li = _orders(sf_dir), _li(sf_dir)
    lo, hi = relational.PRIORITY_WINDOW
    od = od[
        (od["o_orderdate"] >= pd.Timestamp(lo)) & (od["o_orderdate"] < pd.Timestamp(hi))
    ]
    late = od.merge(li[["l_orderkey", "l_shipdate"]], left_on="o_orderkey",
                    right_on="l_orderkey")
    late = late[
        late["l_shipdate"]
        >= late["o_orderdate"] + pd.Timedelta(days=relational.LATE_SHIP_DAYS)
    ]
    exp = late.drop_duplicates("o_orderkey").groupby("o_orderpriority").size()
    got = dict(zip(out["o_orderpriority"], out["n_orders"]))
    assert got == exp.to_dict()


def test_returned_item_customers_recompute(spark, sf_dir):
    out = relational.returned_item_customers(spark, sf_dir).toPandas()
    li, od = _li(sf_dir), _orders(sf_dir)
    li = li[li["l_returnflag"] == "R"]
    rev = (li["l_extendedprice"] * (1.0 - li["l_discount"])).round(4)
    per_order = pd.DataFrame({"l_orderkey": li["l_orderkey"], "rev": rev})
    j = per_order.merge(od[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
                        right_on="o_orderkey")
    per_cust = j.groupby("o_custkey")["rev"].sum().round(4)
    top = per_cust.reset_index().sort_values(
        ["rev", "o_custkey"], ascending=[False, True]
    ).head(relational.RETURNED_TOP_K)
    assert len(out) == relational.RETURNED_TOP_K
    assert out["c_custkey"].tolist() == top["o_custkey"].tolist()
    np.testing.assert_allclose(out["revenue"], top["rev"], atol=1e-4)
    # nation join correctness for the head row
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    lookup = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    head = out.iloc[0]
    assert (
        lookup[lookup["c_custkey"] == head.c_custkey]["n_name"].iloc[0]
        == head.n_name
    )


def test_local_supplier_volume_recompute(spark, sf_dir):
    out = relational.local_supplier_volume(spark, sf_dir).toPandas()
    li, od = _li(sf_dir), _orders(sf_dir)
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet")
    reg = pd.read_parquet(f"{sf_dir}/region.parquet")
    lo, hi = relational.VOLUME_WINDOW
    od = od[(od["o_orderdate"] >= pd.Timestamp(lo)) & (od["o_orderdate"] < pd.Timestamp(hi))]
    rk = reg[reg["r_name"] == relational.VOLUME_REGION]["r_regionkey"].iloc[0]
    nat = nat[nat["n_regionkey"] == rk]
    j = (
        li.merge(od[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        .merge(supp[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["s_nationkey"] == j["c_nationkey"]]
    j = j.merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey", right_on="n_nationkey")
    rev = (j["l_extendedprice"] * (1.0 - j["l_discount"])).round(4)
    exp = rev.groupby(j["n_name"]).sum().round(4)
    got = dict(zip(out["n_name"], out["revenue"]))
    assert set(got) == set(exp.index)
    for n, v in exp.items():
        assert abs(got[n] - v) < 1e-4


def test_large_volume_customers_recompute(spark, sf_dir):
    out = relational.large_volume_customers(spark, sf_dir).toPandas()
    li, od = _li(sf_dir), _orders(sf_dir)
    qty = li.groupby("l_orderkey")["l_quantity"].sum()
    big = qty[qty > relational.LARGE_ORDER_QTY]
    assert len(out) == len(big)
    assert set(out["o_orderkey"]) == set(big.index)
    assert (out["total_qty"].to_numpy() == big.loc[out["o_orderkey"]].astype(int).to_numpy()).all()
    # descending qty order with orderkey tiebreak
    keys = list(zip(-out["total_qty"], out["o_orderkey"]))
    assert keys == sorted(keys)


def test_rfm_segments_recompute(spark, sf_dir):
    out = relational.rfm_segments(spark, sf_dir).toPandas()
    od = _orders(sf_dir)
    per = od.groupby("o_custkey").agg(
        last_order=("o_orderdate", "max"),
        frequency=("o_orderkey", "size"),
    )
    per["monetary"] = od.groupby("o_custkey")["o_totalprice"].apply(
        lambda s: s.round(2).sum()
    )
    ref = od["o_orderdate"].max()
    per["recency_days"] = (ref.normalize() - per["last_order"].dt.normalize()).dt.days

    def ntile4(series_keys):
        order = sorted(range(len(series_keys)), key=lambda i: series_keys[i])
        n = len(order)
        base, rem = divmod(n, 4)
        qs = np.empty(n, np.int64)
        pos = 0
        for b in range(4):
            size = base + (1 if b < rem else 0)
            for i in order[pos : pos + size]:
                qs[i] = b + 1
            pos += size
        return qs

    custs = per.index.to_numpy()
    r_q = ntile4([(per.loc[c, "recency_days"], c) for c in custs])
    f_q = ntile4([(-per.loc[c, "frequency"], c) for c in custs])
    m_q = ntile4([(-per.loc[c, "monetary"], c) for c in custs])
    seg = pd.DataFrame({"r_q": r_q, "f_q": f_q, "m_q": m_q})
    exp = seg.groupby(["r_q", "f_q", "m_q"]).size()
    got = {(r.r_q, r.f_q, r.m_q): r.n_customers for r in out.itertuples()}
    assert got == exp.to_dict()
    assert out["n_customers"].sum() == len(custs)


def test_part_affinity_lift_recompute(spark, sf_dir):
    out = relational.part_affinity_lift(spark, sf_dir).toPandas()
    li = _li(sf_dir)
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = op["l_orderkey"].nunique()
    part_n = op.groupby("l_partkey").size()
    from collections import Counter

    pair_n = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_n[(parts[i], parts[j])] += 1
    cands = [
        (pa, pb, n)
        for (pa, pb), n in pair_n.items()
        if n >= relational.AFFINITY_MIN_SUPPORT
    ]
    scored = [
        (n, round(n * float(n_orders) / (float(part_n[pa]) * float(part_n[pb])), 6), pa, pb)
        for pa, pb, n in cands
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    exp = scored[: relational.AFFINITY_TOP_K]
    assert len(out) == min(relational.AFFINITY_TOP_K, len(scored))
    for row, (n, lift, pa, pb) in zip(out.itertuples(), exp):
        assert (row.pa, row.pb, row.n_ab) == (pa, pb, n)
        assert abs(row.lift - lift) < 1e-6
        assert row.n_a == part_n[pa] and row.n_b == part_n[pb]
