"""Tests: round-4 session-17 batch 125 — Page-Hinkley drift, keyness
log-likelihood, earth mover's distance."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_page_hinkley_recompute(spark, sf_dir):
    out = parity.page_hinkley_drift(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index()
    mu = float(y.sum()) / len(y)
    m = m_min = 0.0
    rows = []
    for d, c in y.items():
        m += round(float(c) - mu - parity.PH_DELTA, 12)
        m_min = min(m_min if rows else m, m)
        rows.append((d.strftime("%Y-%m-%d"), int(c), m, m - m_min))
    assert len(out) == len(rows)
    for got, exp in zip(out.itertuples(), rows):
        assert (got.day, got.n_events) == exp[:2]
        assert abs(got.m_cum - exp[2]) < 1e-6
        assert abs(got.ph_stat - exp[3]) < 1e-6
        assert got.alarm == int(exp[3] > parity.PH_LAMBDA)
    # PH is nonneg and starts at 0
    assert (out.ph_stat >= 0).all()
    assert out.iloc[0].ph_stat == 0.0


def test_keyness_recompute(spark, sf_dir):
    out = textstats.keyness_loglik_terms(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ina, inb = Counter(), Counter()
    for r in docs.itertuples():
        tgt = ina if r.source == textstats.KEYNESS_SOURCE else inb
        tgt.update(tokenize_string(r.text))
    c, d = sum(ina.values()), sum(inb.values())
    scored = []
    for t in set(ina) | set(inb):
        a, b = ina[t], inb[t]
        e1 = c * (a + b) / (c + d)
        e2 = d * (a + b) / (c + d)
        ll = 2.0 * (
            (a * math.log(a / e1) if a > 0 else 0.0)
            + (b * math.log(b / e2) if b > 0 else 0.0)
        )
        scored.append((round(ll, 6), t, a, b, int(a * (c + d) > c * (a + b))))
    top = sorted(scored, key=lambda x: (-x[0], x[1]))[: textstats.KEYNESS_K]
    assert len(out) == len(top)
    for got, exp in zip(out.itertuples(), top):
        assert got.term == exp[1]
        assert (got.n_in_source, got.n_in_rest) == (exp[2], exp[3])
        assert abs(got.ll - exp[0]) < 1e-6
        assert got.overused == exp[4]
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_emd_recompute(spark, sf_dir):
    out = parity.emd_value_distributions(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["cents"] = (ev.value * 100).round().astype(int)
    assert len(out) == len(parity.EMD_TYPE_PAIRS)
    for r in out.itertuples():
        a = ev[ev.event_type == r.type_a].cents
        b = ev[ev.event_type == r.type_b].cents
        grid = sorted(set(a) | set(b))
        ca = Counter(a)
        cb = Counter(b)
        fa = fb = 0
        emd = 0.0
        for v, nxt in zip(grid, grid[1:]):
            fa += ca[v]
            fb += cb[v]
            emd += round(
                abs(fa / len(a) - fb / len(b)) * (nxt - v), 12
            )
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.emd - emd / 100.0) < 1e-6
    # symmetry of the pinned pair enumeration: each unordered pair once
    assert len(set(map(tuple, out[["type_a", "type_b"]].values))) == len(out)
