"""Tests: round-4 session-18 batch 160 — Ansari-Bradley, BA, DV plan."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_ansari_bradley_recompute(spark, sf_dir):
    out = parity.ansari_bradley_scale_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    arm = ev.user_id.map(
        lambda u: int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16)
        % 2
    )
    vals = (ev.value * 100).round(0).astype("int64")
    df = pd.DataFrame({"v": vals, "arm": arm.values})
    r = df.v.rank(method="average")
    n = len(df)
    s = pd.concat([r, n + 1 - r], axis=1).min(axis=1)
    w = s[df.arm.values == 0].sum()
    nx = int((df.arm == 0).sum())
    ny = n - nx
    sbar = s.mean()
    ssq = ((s - sbar) ** 2).sum()
    ew = nx * sbar
    varw = nx * ny / (n * (n - 1)) * ssq
    assert (out.n_x, out.n_y) == (nx, ny)
    assert abs(out.w_stat - w) < 1e-6
    assert abs(out.z_stat - (w - ew) / math.sqrt(varw)) < 1e-5


def test_bland_altman_recompute(spark, sf_dir):
    out = parity.bland_altman_order_totals(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    b = li.groupby("l_orderkey").l_extendedprice.sum().round(2)
    j = o[o.o_orderkey.isin(b.index)]
    d = (j.o_totalprice.round(2).values - b[j.o_orderkey].values).round(2)
    n = len(d)
    bias = d.mean()
    sd = d.std(ddof=1)
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    n_out = int(((d < lo) | (d > hi)).sum())
    assert out.n_pairs == n
    assert abs(out.bias - bias) < 1e-5
    assert abs(out.sd_diff - sd) < 1e-5
    assert abs(out.loa_lower - lo) < 1e-4
    assert abs(out.loa_upper - hi) < 1e-4
    assert out.n_outside == n_out
    assert abs(out.pct_outside - n_out / n) < 1e-6


def test_deletion_vector_recompute(spark, sf_dir):
    out = relational.deletion_vector_plan(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ed = o.o_orderdate.astype("int64") // 86_400_000_000
    cutoff = int(ed.min()) + (int(ed.max()) - int(ed.min())) // 4
    df = pd.DataFrame({"f": o.o_orderkey // 8192, "del_": ed < cutoff})
    per = df.groupby("f").agg(n=("del_", "size"), nd=("del_", "sum"))
    clean = dv = rw = dvb = rwb = 0
    for r in per.itertuples():
        if r.nd == 0:
            clean += 1
        elif 8 + min(2 * r.nd, 1024) < 100 * (r.n - r.nd):
            dv += 1
            dvb += 8 + min(2 * r.nd, 1024)
        else:
            rw += 1
            rwb += 100 * (r.n - r.nd)
    assert out.n_files == len(per)
    assert (out.files_clean, out.files_dv, out.files_rewrite) == (
        clean,
        dv,
        rw,
    )
    assert out.rows_deleted == per.nd.sum()
    assert (out.dv_bytes_total, out.rewrite_bytes_total) == (dvb, rwb)
