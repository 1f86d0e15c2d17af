"""Tests: round-4 session-18 batch 184 — fairness panel, PPCC."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_fairness_panel_recompute(spark, sf_dir):
    out = parity.fairness_metrics_panel(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    g = ev.user_id.map(
        lambda u: int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16)
        % 2
    )
    pred = ((ev.value * 100).round(0).astype("int64") > 5000).astype(int)
    y = (ev.event_type == "purchase").astype(int)
    sr, tpr, fpr = {}, {}, {}
    for k in (0, 1):
        m = g == k
        sr[k] = pred[m].mean()
        tpr[k] = pred[m & (y == 1)].mean()
        fpr[k] = pred[m & (y == 0)].mean()
    air = min(sr.values()) / max(sr.values())
    assert out.n_events == len(ev)
    assert abs(out.selection_rate_g0 - sr[0]) < 1e-6
    assert abs(out.demographic_parity_diff - (sr[0] - sr[1])) < 1e-6
    assert abs(out.equal_opportunity_diff - (tpr[0] - tpr[1])) < 1e-6
    assert abs(out.equalized_odds_fpr_diff - (fpr[0] - fpr[1])) < 1e-6
    assert abs(out.adverse_impact_ratio - air) < 1e-6
    assert out.passes_four_fifths == int(air >= 0.8)
    # md5 arms are exchangeable: a random split should pass 4/5ths
    assert out.passes_four_fifths == 1


def test_ppcc_recompute(spark, sf_dir):
    out = parity.ppcc_exponential_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    us = ev.ts.astype("int64")
    gaps = []
    for _, grp in us.groupby(ev.user_id):
        d = grp.diff().dropna()
        gaps.extend(int(x) for x in d if x > 0)
    gaps.sort()
    n = len(gaps)
    q = -np.log(1 - (np.arange(1, n + 1) - 0.3) / (n + 0.4))
    r = np.corrcoef(gaps, q)[0, 1]
    assert out.n_gaps == n
    assert abs(out.ppcc - r) < 1e-4
    assert out.looks_exponential == int(r > 0.95)
