"""Tests: round-4 session-16 batch 97 — degree assortativity, weighted
median, simhash bit balance."""

from __future__ import annotations

import collections
import math

import pandas as pd

from lucene_mapreduce_spark.operators import dedup, relational


def test_assortativity_recompute(spark, sf_dir):
    out = relational.degree_assortativity(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    edges = cnt[cnt >= relational.AFFINITY_MIN_SUPPORT].index.tolist()
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    rho = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert r.n_edges == len(edges)
    assert abs(r.assortativity - rho) < 1e-5
    assert -1.0 <= r.assortativity <= 1.0


def test_weighted_median_recompute(spark, sf_dir):
    out = relational.weighted_median_price(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["price"] = li.l_extendedprice.round(2)
    li["w"] = li.l_quantity.astype("int64")
    rows = {r.l_returnflag: r for r in out.itertuples()}
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values(
            ["price", "l_orderkey", "l_linenumber"], kind="mergesort"
        )
        wtot = int(g.w.sum())
        cw = 0
        med = None
        for _, row in g.iterrows():
            cw += row.w
            if cw * 2 >= wtot:
                med = row.price
                break
        r = rows[flag]
        assert r.n_rows == len(g)
        assert r.total_weight == wtot
        assert abs(r.weighted_median - med) < 5e-3


def test_simhash_balance_recompute(spark, sf_dir):
    out = dedup.simhash_bit_balance(spark, sf_dir).toPandas()
    sigs = dedup.simhash(spark, sf_dir).toPandas()
    n = len(sigs)
    assert len(out) == 64
    lo = sigs.simhash_lo.astype("int64").values
    hi = sigs.simhash_hi.astype("int64").values
    for r in out.itertuples():
        if r.bit < 32:
            ones = int(((lo >> int(r.bit)) & 1).sum())
        else:
            ones = int(((hi >> int(r.bit - 32)) & 1).sum())
        assert r.ones == ones
        assert abs(r.ones_frac - ones / n) < 5e-7
        assert abs(r.bias - abs(ones / n - 0.5)) < 5e-7
    # a healthy md5-derived family: no bit should be fully stuck
    assert (out.ones > 0).all() and (out.ones < n).all()
