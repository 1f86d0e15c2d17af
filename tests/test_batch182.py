"""Tests: round-4 session-18 batch 182 — h-index, mode skew, endings."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_h_index_recompute(spark, sf_dir):
    out = parity.activity_h_index(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    counts = sorted(ev.groupby("user_id").size(), reverse=True)
    h = max(
        (r for r, c in enumerate(counts, 1) if c >= r), default=0
    )
    cum = np.cumsum(counts)
    g = max(
        (r for r in range(1, len(counts) + 1) if cum[r - 1] >= r * r),
        default=0,
    )
    assert out.n_users == len(counts)
    assert out.n_events == sum(counts)
    assert out.h_index == h
    assert out.g_index == g
    assert out.g_index >= out.h_index  # g dominates h by construction


def test_mode_skewness_recompute(spark, sf_dir):
    out = parity.mode_skewness_panel(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = (ev.value * 100).round(0).astype("int64")
    tab = Counter(cents)
    mode = min(
        (c for c, n in tab.items() if n == max(tab.values()))
    )
    mean, sd = cents.mean(), cents.std(ddof=1)
    med = np.percentile(cents, 50)
    assert out.n == len(cents)
    assert abs(out.mode_value - mode / 100) < 1e-9
    assert abs(out.mode_skewness - (mean - mode) / sd) < 1e-5
    assert abs(out.median_skewness - 3 * (mean - med) / sd) < 1e-5


def test_price_ending_recompute(spark, sf_dir):
    out = parity.price_ending_audit(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    end = ((o.o_totalprice * 100).round(0).astype("int64") % 100)
    tab = Counter(end)
    n = len(end)
    chi = sum(
        (tab.get(e, 0) - n / 100) ** 2 / (n / 100) for e in range(100)
    )
    top = sorted(tab.items(), key=lambda kv: (-kv[1], kv[0]))[
        : parity.PRICE_ENDING_TOP_K
    ]
    for i, row in enumerate(out.itertuples()):
        e, c = top[i]
        assert (row.ending, row.n_orders) == (e, c)
        assert abs(row.share - c / n) < 1e-6
        assert abs(row.uniformity_chi2 - chi) < 1e-3
