"""Tests: round-4 session-17 batch 149 — risk ratio panel, GK gamma,
variance ratio."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity


def test_risk_ratio_recompute(spark, sf_dir):
    out = parity.risk_ratio_panel(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    a = b = c = d = 0
    for t in docs.text:
        toks = set(tokenize_string(t))
        e = parity.MH_EXPOSURE_TOKEN in toks
        o = parity.MH_OUTCOME_TOKEN in toks
        if e and o:
            a += 1
        elif e:
            b += 1
        elif o:
            c += 1
        else:
            d += 1
    r1, r0 = a / (a + b), c / (c + d)
    rpop = (a + c) / (a + b + c + d)
    assert (out.a, out.b, out.c, out.d) == (a, b, c, d)
    assert abs(out.risk_ratio - r1 / r0) < 1e-6
    assert abs(out.risk_difference - (r1 - r0)) < 1e-6
    assert abs(out.nnt - 1 / abs(r1 - r0)) < 1e-4
    assert abs(out.paf - (rpop - r0) / rpop) < 1e-6


def test_gamma_recompute(spark, sf_dir):
    out = parity.goodman_kruskal_gamma(spark, sf_dir).toPandas().iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sz = li.groupby("l_orderkey").size()
    df = orders[["o_orderkey", "o_orderpriority"]].copy()
    df["v"] = df.o_orderkey.map(sz)
    df = df.dropna(subset=["v"])
    qs = [np.percentile(df.v, q) for q in (25, 50, 75)]
    df["sb"] = df.v.map(lambda v: sum(v > q for q in qs))
    cells = Counter(zip(df.o_orderpriority, df.sb))
    conc = disc = 0
    for (pa, sa), ca in cells.items():
        for (pb, sb), cb in cells.items():
            if pa < pb and sa < sb:
                conc += ca * cb
            elif pa < pb and sa > sb:
                disc += ca * cb
    assert (out.n_concordant, out.n_discordant) == (conc, disc)
    assert abs(out.gamma - (conc - disc) / (conc + disc)) < 1e-6
    assert -1 <= out.gamma <= 1


def test_variance_ratio_recompute(spark, sf_dir):
    out = parity.variance_ratio_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = [
        int(v)
        for v in days.value_counts().reindex(cal, fill_value=0).sort_index()
    ]
    d1 = [b - a for a, b in zip(y, y[1:])]
    d2 = [b - a for a, b in zip(y, y[2:])]

    def var(xs):
        n = len(xs)
        m = sum(xs) / n
        return (sum(x * x for x in xs) - sum(xs) * m) / (n - 1)

    v1, v2 = var(d1), var(d2)
    vr = v2 / (2 * v1)
    assert out.n_changes == len(d1)
    assert abs(out.var_1d - v1) < 1e-5
    assert abs(out.var_2d - v2) < 1e-5
    assert abs(out.variance_ratio - vr) < 1e-6
    assert abs(out.z_stat - (vr - 1) * math.sqrt(len(d1))) < 1e-5
