"""Tests: round-4 session-17 batch 116 — power-law degree MLE,
Mantel-Haenszel pooled OR, Brown-Forsythe test."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, relational


def _coorder_degrees(sf_dir: str) -> dict[int, int]:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    pairs = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    pairs = pairs[pairs >= relational.AFFINITY_MIN_SUPPORT]
    deg: dict[int, int] = {}
    for pa, pb in pairs.index:
        deg[pa] = deg.get(pa, 0) + 1
        deg[pb] = deg.get(pb, 0) + 1
    return deg


def test_degree_powerlaw_recompute(spark, sf_dir):
    out = relational.degree_powerlaw_mle(spark, sf_dir).toPandas().iloc[0]
    deg = _coorder_degrees(sf_dir)
    ds = list(deg.values())
    dmin = min(ds)
    s = sum(math.log(d / (dmin - 0.5)) for d in ds)
    assert (out.n_nodes, out.d_min, out.d_max) == (
        len(ds), dmin, max(ds),
    )
    assert abs(out.sum_log - s) < 1e-6
    assert abs(out.alpha - (1.0 + len(ds) / s)) < 1e-5
    assert out.alpha > 1.0


def test_mantel_haenszel_recompute(spark, sf_dir):
    out = parity.mantel_haenszel_or(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells: dict[str, list[int]] = {}
    for r in docs.itertuples():
        ts = set(tokenize_string(r.text))
        e = parity.MH_EXPOSURE_TOKEN in ts
        o = parity.MH_OUTCOME_TOKEN in ts
        c = cells.setdefault(r.lang, [0, 0, 0, 0])
        c[0 if (e and o) else 1 if e else 2 if o else 3] += 1
    num = den = 0.0
    for lang, (a, b, c, d) in sorted(cells.items()):
        n = a + b + c + d
        num += round(a * d / n, 12)
        den += round(b * c / n, 12)
        row = out[out.stratum == lang].iloc[0]
        assert (row.n11, row.n10, row.n01, row.n00) == (a, b, c, d)
        if b * c > 0:
            assert abs(row.or_value - (a * d) / (b * c)) < 1e-6
    pooled = out[out.stratum == "(pooled)"].iloc[0]
    assert pooled.n11 == sum(v[0] for v in cells.values())
    assert abs(pooled.or_value - num / den) < 1e-6
    assert len(out) == len(cells) + 1


def test_brown_forsythe_recompute(spark, sf_dir):
    out = parity.brown_forsythe_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["v"] = ev.value.round(6)
    med = ev.groupby("event_type").v.quantile(0.5)  # pandas = type-7
    z = (ev.v - ev.event_type.map(med)).abs().round(6)
    zz = (z * z).round(6)
    g = pd.DataFrame({"z": z, "zz": zz, "t": ev.event_type}).groupby("t")
    n = g.z.count()
    sz, szz = g.z.sum(), g.zz.sum()
    k, n_tot = len(n), int(n.sum())
    m = sz.sum() / n_tot
    ssb = sum(round(ni * (szi / ni - m) ** 2, 6) for ni, szi in zip(n, sz))
    ssw = sum(
        round(szzi - ni * (szi / ni) ** 2, 6)
        for ni, szi, szzi in zip(n, sz, szz)
    )
    f = (ssb / (k - 1)) / (ssw / (n_tot - k))
    assert (out.k, out.n_tot, out.df1, out.df2) == (
        k, n_tot, k - 1, n_tot - k,
    )
    assert abs(out.f_stat - f) < 1e-4
    assert out.f_stat > 0
