"""Tests: round-4 session-17 batch 146 — burstiness, GM-AM gap, Q-Q
deciles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_burstiness_recompute(spark, sf_dir):
    out = parity.interevent_burstiness(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    es = ev.ts.values.astype("datetime64[us]").astype("int64") // 1_000_000
    ev = ev.assign(es=es)
    gaps = []
    for _, grp in ev.groupby("user_id"):
        s = grp.sort_values(["es", "event_id"]).es.tolist()
        gaps.extend(b - a for a, b in zip(s, s[1:]))
    n = len(gaps)
    mean = sum(gaps) / n
    sd = math.sqrt(
        (sum(g * g for g in gaps) - sum(gaps) * mean) / (n - 1)
    )
    cv = sd / mean
    assert out.n_gaps == n
    assert abs(out.mean_gap_s - mean) < 1e-5
    assert abs(out.sd_gap_s - sd) < 1e-4
    assert abs(out.cv - cv) < 1e-6
    assert abs(out.burstiness_b - (cv - 1) / (cv + 1)) < 1e-6
    assert -1 <= out.burstiness_b <= 1


def test_gm_am_recompute(spark, sf_dir):
    out = parity.gm_am_revenue_gap(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = len(o)
    am = sum(sorted(round(float(v), 2) for v in o.o_totalprice)) / n
    sln = sum(sorted(round(math.log(float(v)), 12) for v in o.o_totalprice))
    gm = math.exp(sln / n)
    assert out.n == n
    assert abs(out.arithmetic_mean - am) < 1e-2
    assert abs(out.geometric_mean - gm) < 1e-2
    assert abs(out.gm_over_am - gm / am) < 1e-6
    # AM-GM inequality
    assert out.gm_over_am <= 1.0


def test_qq_recompute(spark, sf_dir):
    out = parity.qq_decile_comparison(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x = ev[ev.event_type == parity.DCOR_TYPE_X].value
    y = ev[ev.event_type == parity.DCOR_TYPE_Y].value
    assert list(out.pct) == [int(p * 100) for p in parity.QQ_DECILES]
    for r, p in zip(out.itertuples(), parity.QQ_DECILES):
        qx = float(np.percentile(x, p * 100))
        qy = float(np.percentile(y, p * 100))
        assert abs(r.q_click - qx) < 1e-5
        assert abs(r.q_purchase - qy) < 1e-5
        assert abs(r.ratio - qy / qx) < 1e-5
    # deciles are nondecreasing on both sides
    assert list(out.q_click) == sorted(out.q_click)
    assert list(out.q_purchase) == sorted(out.q_purchase)
