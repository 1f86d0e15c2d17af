"""Tests: round-4 session-16 batch 106 — business-day latency, integer
division semantics."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _biz_days(ord_d: int, ship_d: int) -> int:
    full = (ship_d - ord_d) // 7
    biz = full * 5
    start = (ord_d - relational.DOW_ANCHOR) % 7
    rem = (ship_d - ord_d) - full * 7
    for i in range(rem):
        if (start + i) % 7 < 5:
            biz += 1
    return biz


def test_business_days_recompute(spark, sf_dir):
    out = relational.business_day_latency(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["ship_d"] = j.l_shipdate.astype("int64") // 86400000000
    j["ord_d"] = j.o_orderdate.astype("int64") // 86400000000
    j = j[j.ship_d >= j.ord_d]
    rows = {r.o_orderpriority: r for r in out.itertuples()}
    for pri, g in j.groupby("o_orderpriority"):
        biz = np.array(
            [_biz_days(o, s_) for o, s_ in zip(g.ord_d, g.ship_d)],
            dtype=float,
        )
        r = rows[pri]
        assert r.n_lines == len(g)
        assert abs(r.p50_biz_days - float(np.quantile(biz, 0.5))) < 1e-6
        assert abs(r.p90_biz_days - float(np.quantile(biz, 0.9))) < 1e-6
        assert r.max_biz_days == int(biz.max())
    # business days can never exceed 5/7 of calendar days (+boundary)
    max_cal = int((j.ship_d - j.ord_d).max())
    assert (out.max_biz_days <= max_cal * 5 // 7 + 5).all()


def test_divmod_semantics_recompute(spark, sf_dir):
    out = relational.integer_division_semantics_gate(
        spark, sf_dir
    ).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    vals = sorted({int(u) - relational.DIVMOD_PROBE_SHIFT
                   for u in ev.user_id})
    buckets = {}
    for a in vals:
        tdiv = int(a / 7) if a >= 0 else -((-a) // 7)  # trunc toward 0
        srem = a - tdiv * 7
        pm = ((a % 7) + 7) % 7
        b = "negative" if a < 0 else "non_negative"
        n, st, sr, sp, items = buckets.get(b, (0, 0, 0, 0, []))
        items = items + [f"{a}:{tdiv}:{srem}:{pm}"]
        buckets[b] = (n + 1, st + tdiv, sr + srem, sp + pm, items)
    rows = {r.bucket: r for r in out.itertuples()}
    assert set(rows) == set(buckets)
    for b, (n, st, sr, sp, items) in buckets.items():
        r = rows[b]
        assert (r.n, r.sum_tdiv, r.sum_srem, r.sum_pmod) == (
            n, st, sr, sp,
        )
        w = hashlib.md5(",".join(sorted(items)).encode()).hexdigest()
        assert r.witness == w
    # the probe must actually exercise negative operands
    assert "negative" in rows and rows["negative"].n > 0
