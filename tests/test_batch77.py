"""Tests: round-4 session-16 batch 77 — z-order layout plan, min/max
file-skipping audit, Theil-Sen weekly revenue trend."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _zval(bx, by):
    z = np.zeros_like(bx)
    for i in range(4):
        z += ((bx >> i) & 1) << (2 * i + 1)
        z += ((by >> i) & 1) << (2 * i)
    return z


def _ntile(n, k):
    base, extra = divmod(n, k)
    out = np.empty(n, dtype=int)
    pos = 0
    for f in range(1, k + 1):
        size = base + (1 if f <= extra else 0)
        out[pos : pos + size] = f
        pos += size
    return out


def test_zorder_recompute(spark, sf_dir):
    out = relational.zorder_layout_plan(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"]
    ].copy()
    nx = int(li.l_partkey.max()) + 1
    ny = int(li.l_suppkey.max()) + 1
    xb, yb = relational.ZORDER_X_BUCKETS, relational.ZORDER_Y_BUCKETS
    pb = relational.ZORDER_PRED_BUCKET
    li["bx"] = li.l_partkey * xb // nx
    li["by"] = li.l_suppkey * yb // ny
    li["z"] = _zval(li.bx.values, li.by.values)
    preds = {
        "x_range": ("l_partkey", nx * pb // xb, nx * (pb + 1) // xb - 1),
        "y_range": ("l_suppkey", ny * pb // yb, ny * (pb + 1) // yb - 1),
    }
    orders = {
        "linear": ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"],
        "zorder": ["z", "l_partkey", "l_suppkey", "l_orderkey",
                   "l_linenumber"],
    }
    assert len(out) == 4
    for lname, cols in orders.items():
        s = li.sort_values(cols, kind="mergesort").reset_index(drop=True)
        s["f"] = _ntile(len(s), relational.ZORDER_N_FILES)
        g = s.groupby("f").agg(
            min_x=("l_partkey", "min"), max_x=("l_partkey", "max"),
            min_y=("l_suppkey", "min"), max_y=("l_suppkey", "max"),
            n=("f", "size"),
        )
        for pname, (col, lo, hi) in preds.items():
            mn, mx = ("min_x", "max_x") if col == "l_partkey" else (
                "min_y", "max_y")
            hit = (g[mn] <= hi) & (g[mx] >= lo)
            r = out[(out.layout == lname) & (out.predicate == pname)].iloc[0]
            assert r.n_files == relational.ZORDER_N_FILES
            assert r.files_read == int(hit.sum())
            assert r.rows_scanned == int(g.n[hit].sum())
            assert r.rows_matched == int(li[col].between(lo, hi).sum())
    # the point of z-order: it prunes BOTH dims, linear only the leading one
    lin_y = out[(out.layout == "linear") & (out.predicate == "y_range")]
    z_y = out[(out.layout == "zorder") & (out.predicate == "y_range")]
    assert int(lin_y.files_skipped.iloc[0]) == 0
    assert int(z_y.files_skipped.iloc[0]) > 0


def test_file_skipping_recompute(spark, sf_dir):
    out = relational.file_skipping_audit(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_orderdate"]
    ].copy()
    o["d_us"] = o.o_orderdate.astype("int64")
    lo = pd.Timestamp("1998-01-01", tz="UTC").value // 1000
    hi = pd.Timestamp("1998-03-31", tz="UTC").value // 1000
    matched = int(o.d_us.between(lo, hi).sum())
    for lname, cols in (
        ("arrival", ["o_orderkey"]),
        ("date_sorted", ["d_us", "o_orderkey"]),
    ):
        s = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
        s["f"] = _ntile(len(s), relational.SKIP_N_FILES)
        g = s.groupby("f").d_us.agg(["min", "max", "size"])
        hit = (g["min"] <= hi) & (g["max"] >= lo)
        r = out[out.layout == lname].iloc[0]
        assert r.files_read == int(hit.sum())
        assert r.rows_matched == matched
        assert r.rows_scanned == int(g["size"][hit].sum())
    # clustering on the filter key must strictly beat arrival order here
    assert (
        out[out.layout == "date_sorted"].files_read.iloc[0]
        < out[out.layout == "arrival"].files_read.iloc[0]
    )


def test_theil_sen_recompute(spark, sf_dir):
    out = relational.theil_sen_weekly_trend(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["wk"] = (o.o_orderdate.astype("int64") // 86400000000) // 7
    o["tp"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    weekly = (o.groupby("wk").tp.sum() / 100.0).sort_index()
    wks = weekly.index.values.astype(float)
    revs = weekly.values
    slopes = []
    for i in range(len(wks)):
        for j in range(i + 1, len(wks)):
            slopes.append(round((revs[j] - revs[i]) / (wks[j] - wks[i]), 6))
    assert r.n_weeks == len(wks)
    assert r.n_pairs == len(slopes)
    sen = float(np.quantile(np.array(slopes), 0.5))
    assert abs(r.sen_slope - sen) < 5e-6
    resid = [round(rv - sen * w, 6) for w, rv in zip(wks, revs)]
    assert abs(r.intercept - float(np.quantile(np.array(resid), 0.5))) < 1e-4
