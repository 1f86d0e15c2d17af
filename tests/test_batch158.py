"""Tests: round-4 session-18 batch 158 — roaring, WE rules, price index."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, relational


def test_roaring_recompute(spark, sf_dir):
    out = fulltext.roaring_container_plan(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cont = Counter()
    for r in docs.itertuples():
        for t in set(tokenize_string(r.text)):
            cont[(t, r.doc_id // 65536)] += 1
    n_arr = sum(1 for c in cont.values() if c < 4096)
    rbytes = sum(8 + 2 * c if c < 4096 else 8200 for c in cont.values())
    abytes = sum(8 + 2 * c for c in cont.values())
    assert out.n_terms == len({t for t, _ in cont})
    assert out.n_containers == len(cont)
    assert out.n_array_containers == n_arr
    assert out.n_bitmap_containers == len(cont) - n_arr
    assert out.n_postings == sum(cont.values())
    assert (out.bytes_roaring, out.bytes_array_only) == (rbytes, abytes)
    assert abs(out.roaring_over_array - rbytes / abytes) < 1e-6


def test_western_electric_recompute(spark, sf_dir):
    out = parity.western_electric_rules(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    y = list(ed.value_counts().reindex(cal, fill_value=0).sort_index())
    n = len(y)
    mu = sum(y) / n
    sd = math.sqrt(sum(v * v for v in y) / n - mu * mu)
    z = [(v - mu) / sd for v in y]
    r1 = sum(1 for v in z if abs(v) > 3)
    r2 = r3 = r4 = 0
    for i in range(n):
        if i >= 2:
            w = z[i - 2 : i + 1]
            if sum(v > 2 for v in w) >= 2 or sum(v < -2 for v in w) >= 2:
                r2 += 1
        if i >= 4:
            w = z[i - 4 : i + 1]
            if sum(v > 1 for v in w) >= 4 or sum(v < -1 for v in w) >= 4:
                r3 += 1
        if i >= 7:
            w = z[i - 7 : i + 1]
            if sum(v > 0 for v in w) >= 8 or sum(v < 0 for v in w) >= 8:
                r4 += 1
    assert out.n_days == n
    assert (
        out.r1_violations,
        out.r2_violations,
        out.r3_violations,
        out.r4_violations,
    ) == (r1, r2, r3, r4)


def test_price_index_recompute(spark, sf_dir):
    out = relational.price_index_panel(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.assign(month=li.l_shipdate.dt.strftime("%Y-%m"))
    m0, m1 = li.month.min(), li.month.max()
    per = (
        li[li.month.isin([m0, m1])]
        .groupby(["l_partkey", "month"])
        .agg(q=("l_quantity", "sum"), v=("l_extendedprice", "sum"))
    )
    per["p"] = (per.v / per.q).round(6)
    a = per.xs(m0, level="month")
    b = per.xs(m1, level="month")
    common = a.index.intersection(b.index)
    s10 = sum(round(b.p[k] * a.q[k], 6) for k in common)
    s00 = sum(round(a.p[k] * a.q[k], 6) for k in common)
    s11 = sum(round(b.p[k] * b.q[k], 6) for k in common)
    s01 = sum(round(a.p[k] * b.q[k], 6) for k in common)
    lasp, paas = s10 / s00, s11 / s01
    assert (out.month0, out.month1) == (m0, m1)
    assert out.n_common_parts == len(common)
    assert abs(out.laspeyres - lasp) < 1e-6
    assert abs(out.paasche - paas) < 1e-6
    assert abs(out.fisher - math.sqrt(lasp * paas)) < 1e-6
