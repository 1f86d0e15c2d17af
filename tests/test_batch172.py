"""Tests: round-4 session-18 batch 172 — term gaps, window PMI, TSB."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity


def test_term_gap_recompute(spark, sf_dir):
    out = fulltext.term_gap_histogram(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    hist = Counter()
    for txt in docs.text:
        toks = tokenize_string(txt)
        pa = [i for i, t in enumerate(toks) if t == fulltext.TERM_GAP_A]
        pb = [i for i, t in enumerate(toks) if t == fulltext.TERM_GAP_B]
        if pa and pb:
            hist[min(abs(i - j) for i in pa for j in pb)] += 1
    assert dict(zip(out.gap, out.n_docs)) == dict(hist)
    assert list(out.gap) == sorted(out.gap)


def test_window_pmi_recompute(spark, sf_dir):
    out = fulltext.window_cooccurrence_pmi(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pc = Counter()
    for txt in docs.text:
        toks = tokenize_string(txt)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + fulltext.COOC_WINDOW + 1,
                                      len(toks))):
                a, b = sorted((toks[i], toks[j]))
                pc[(a, b)] += 1
    n = sum(pc.values())
    uc = Counter()
    for (a, b), c in pc.items():
        uc[a] += c
        uc[b] += c
    rows = [
        (a, b, c, round(math.log(c * n / (uc[a] * uc[b])), 6))
        for (a, b), c in pc.items()
        if c >= fulltext.COOC_MIN_COUNT
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    for i, row in enumerate(out.itertuples()):
        a, b, c, pmi = rows[i]
        assert (row.a, row.b, row.pair_count) == (a, b, c)
        assert abs(row.pmi - pmi) < 1e-6
        assert row.rank == i + 1


def test_tsb_recompute(spark, sf_dir):
    out = parity.tsb_intermittent_forecast(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pkey = li.l_partkey.min()
    sub = li[li.l_partkey == pkey]
    ed = sub.l_shipdate.astype("int64") // 86_400_000_000
    daily = sub.groupby(ed).l_quantity.sum().sort_index()
    days = range(int(daily.index.min()), int(daily.index.max()) + 1)
    z = p = None
    for d in days:
        q = float(daily.get(d, 0.0))
        has = 1.0 if d in daily.index else 0.0
        if z is None:
            z, p = q, has  # first day has demand by construction
            continue
        if has:
            z = (z + q) / 2
        p = (p + has) / 2
    assert out.part_key == pkey
    assert out.n_days == len(list(days))
    assert out.n_demand_days == len(daily)
    assert abs(out.z_final - z) < 1e-6
    assert abs(out.p_final - p) < 1e-6
    assert abs(out.tsb_forecast - p * z) < 1e-6
    # TSB forecast is a per-period rate: below the conditional size
    assert out.tsb_forecast <= out.z_final + 1e-9
