"""Tests: round-4 session-17 batch 136 — distance correlation, Hill
index, watermark lateness."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _series(sf_dir, etype):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    sub = ev[ev.event_type == etype].ts.dt.normalize()
    return sub.value_counts().reindex(cal, fill_value=0).sort_index().values


def test_dcor_recompute(spark, sf_dir):
    out = parity.distance_correlation_daily(spark, sf_dir).toPandas().iloc[0]
    x = _series(sf_dir, parity.DCOR_TYPE_X).astype(float)
    y = _series(sf_dir, parity.DCOR_TYPE_Y).astype(float)
    n = len(x)

    def centered(v):
        a = np.abs(v[:, None] - v[None, :])
        return a - a.mean(axis=1, keepdims=True) - a.mean(
            axis=0, keepdims=True
        ) + a.mean()

    A, B = centered(x), centered(y)
    dcov2 = (A * B).mean()
    dvx, dvy = (A * A).mean(), (B * B).mean()
    dcor = math.sqrt(dcov2) / math.sqrt(math.sqrt(dvx * dvy))
    assert out.n_days == n
    assert abs(out.dcov2 - dcov2) < 1e-4
    assert abs(out.dvar_x - dvx) < 1e-4
    assert abs(out.dvar_y - dvy) < 1e-4
    assert abs(out.dcor - dcor) < 1e-5
    assert 0 <= out.dcor <= 1


def test_hill_recompute(spark, sf_dir):
    out = parity.hill_tail_index(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    srt = o.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    k = parity.HILL_K
    xk = float(srt.o_totalprice.iloc[k])
    gamma = sum(
        sorted(
            round(math.log(float(v) / xk), 12)
            for v in srt.o_totalprice.iloc[:k]
        )
    ) / k
    assert out.k == k
    assert abs(out.threshold_x - round(xk, 2)) < 1e-6
    assert abs(out.hill_gamma - gamma) < 1e-6
    assert abs(out.tail_alpha - 1.0 / round(gamma, 6)) < 1e-6
    assert out.hill_gamma > 0


def test_lateness_recompute(spark, sf_dir):
    out = parity.watermark_lateness_profile(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    es = ev.ts.values.astype("datetime64[us]").astype("int64") // 1_000_000
    rows = sorted(
        (
            int(e) // 600,
            int(
                hashlib.md5(f"arr:{i}".encode()).hexdigest()[:13], 16
            ),
            int(i),
            int(e),
        )
        for i, e in zip(ev.event_id, es)
    )
    run = -1
    lates = []
    for _, _, _, e in rows:
        run = max(run, e)
        lates.append(run - e)
    buckets = {}
    for ls in lates:
        if ls == 0:
            b = "on_time"
        elif ls <= 60:
            b = "le_1m"
        elif ls <= 600:
            b = "le_10m"
        elif ls <= 3600:
            b = "le_1h"
        else:
            b = "gt_1h"
        buckets[b] = buckets.get(b, 0) + 1
    p95 = float(np.percentile(lates, 95))
    assert list(out.bucket) == sorted(buckets)
    for r in out.itertuples():
        assert r.n == buckets[r.bucket]
        assert abs(r.share - buckets[r.bucket] / len(lates)) < 1e-6
        assert abs(r.p95_late_s - p95) < 1e-6
    # the shuffled-batch arrival model must produce real lateness
    assert len(buckets) > 1
