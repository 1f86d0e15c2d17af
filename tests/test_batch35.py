"""Tests: round-4 session-12 batch 35 (grouped percentiles, Wilson reach,
hourly profile, int8 quantization audit) — independent recomputes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity


def test_value_percentiles_recompute(spark, sf_dir):
    out = parity.value_percentiles_by_type(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["v"] = ev["value"].round(6)
    for r in out.itertuples():
        # numpy 'linear' == type-7, same as Spark percentile / quantile_cont
        want = np.percentile(
            ev[ev["event_type"] == r.event_type]["v"], r.p * 100
        )
        assert abs(r.value_quantile - round(float(want), 6)) < 1e-6
    assert len(out) == ev["event_type"].nunique() * len(parity.VALUE_PERCENTILES)


def test_user_reach_wilson_recompute(spark, sf_dir):
    out = parity.user_reach_wilson(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    n = ev["user_id"].nunique()
    z = parity.WILSON_Z
    for r in out.itertuples():
        k = ev[ev["event_type"] == r.event_type]["user_id"].nunique()
        p = k / n
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n)) / denom
        assert int(r.n_users_type) == k and int(r.n_users) == n
        assert abs(r.p_hat - round(p, 6)) < 1e-9
        assert abs(r.wilson_lo - round(center - half, 6)) < 1e-9
        assert abs(r.wilson_hi - round(center + half, 6)) < 1e-9
        # interval properties: contains p_hat, inside [0, 1]
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0


def test_hourly_profile_recompute(spark, sf_dir):
    out = parity.hourly_activity_profile(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(hour=(us // 3_600_000_000) % 24)
    want = ev.groupby(["hour", "event_type"]).size()
    assert len(out) == len(want)
    for r in out.itertuples():
        assert int(r.n_events) == int(want[(r.hour, r.event_type)])
    assert out["n_events"].sum() == len(ev)


def test_int8_quantization_recompute(spark, sf_dir):
    out = similarity.int8_quantization_audit(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    mn, mx = V.min(axis=0), V.max(axis=0)
    scale = (mx - mn) / 255.0
    safe = np.where(scale == 0, 1.0, scale)
    code = np.round((V - mn) / safe)
    deq = np.where(scale == 0, mn, mn + code * safe)
    mse = np.round(((V - deq) ** 2).sum(axis=1) / 64.0, 6)
    labels = emb["label"].to_numpy()
    for r in out.itertuples():
        m = mse[labels == r.label]
        assert int(r.n_vecs) == len(m)
        assert abs(r.mean_mse - round(float(m.mean()), 6)) < 1e-6
        assert abs(r.max_mse - float(m.max())) < 1e-9
    # int8 on a [min,max] grid keeps errors tiny relative to the data scale
    span2 = float(((mx - mn) ** 2).mean())
    assert out["max_mse"].max() <= span2 / 4  # far below worst-case bucket^2
