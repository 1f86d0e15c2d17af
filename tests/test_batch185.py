"""Tests: round-4 session-18 batch 185 — Benford arc, gaps, supply risk."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def test_benford_arc_recompute(spark, sf_dir):
    out = relational.benford_mantissa_arc_test(spark, sf_dir).toPandas().iloc[
        0
    ]
    v = pd.read_parquet(f"{sf_dir}/orders.parquet").o_totalprice
    v = v[v > 0].to_numpy(dtype=float)
    lg = np.round(np.log(v) * 0.43429448190325176, 12)
    frac = lg - np.floor(lg)
    ang = 2 * math.pi * frac
    xb, yb = np.cos(ang).mean(), np.sin(ang).mean()
    l2 = xb * xb + yb * yb
    assert out.n == len(v)
    assert abs(out.mean_cos - xb) < 1e-6
    assert abs(out.mean_sin - yb) < 1e-6
    assert abs(out.vector_length - math.sqrt(l2)) < 1e-6
    assert abs(out.arc_test_p - math.exp(-len(v) * l2)) < 1e-5
    assert 0 <= out.arc_test_p <= 1


def test_interorder_gap_recompute(spark, sf_dir):
    out = relational.interorder_gap_cv(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    ed = o.o_orderdate.astype("int64") // 86_400_000_000
    gaps = []
    for _, g in ed.groupby(o.o_custkey):
        gaps.extend(int(x) for x in g.diff().dropna())
    mean = sum(gaps) / len(gaps)
    sd = math.sqrt(
        sum((x - mean) ** 2 for x in gaps) / (len(gaps) - 1)
    )
    cv = sd / mean
    assert out.n_gaps == len(gaps)
    assert abs(out.mean_gap_days - mean) < 1e-6
    assert abs(out.cv - cv) < 1e-5
    assert abs(out.burstiness_b - (cv - 1) / (cv + 1)) < 1e-5
    assert -1 < out.burstiness_b < 1


def test_single_source_recompute(spark, sf_dir):
    out = relational.single_source_risk(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    per = (
        li.assign(q=li.l_quantity.round(2))
        .groupby(["l_partkey", "l_suppkey"])
        .q.sum()
    )
    buckets = defaultdict(list)
    for pk, grp in per.groupby(level=0):
        buckets[len(grp)].append(
            round(float(grp.max() / grp.sum()), 12)
        )
    for row in out.itertuples():
        shares = buckets[row.n_suppliers]
        assert row.n_parts == len(shares)
        assert abs(row.mean_top_share - sum(shares) / len(shares)) < 1e-6
    # single-sourced parts have top share exactly 1
    if 1 in buckets:
        one = out[out.n_suppliers == 1].iloc[0]
        assert abs(one.mean_top_share - 1.0) < 1e-9
