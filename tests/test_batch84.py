"""Tests: round-4 session-16 batch 84 — dow seasonality strength,
forecast baseline backtest, bloom file skipping."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _hist(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    eday = ev.ts.astype("int64") // 86400000000
    counts = eday.value_counts().sort_index()
    cal = np.arange(counts.index.min(), counts.index.max() + 1)
    return pd.Series(counts.reindex(cal, fill_value=0).values, index=cal)


def test_dow_strength_recompute(spark, sf_dir):
    out = parity.dow_seasonality_strength(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    hist = _hist(sf_dir)
    y = hist.values.astype(float)
    dow = (hist.index.values - parity.DOW_ANCHOR_DAY) % 7
    g = y.mean()
    s = np.array([y[dow == d].mean() for d in dow])
    ss_total = float(np.sum((y - g) ** 2))
    ss_resid = float(np.sum((y - s) ** 2))
    n = len(y)
    assert r.n_days == n
    assert abs(r.var_total - ss_total / n) < 1e-3
    assert abs(r.var_resid - ss_resid / n) < 1e-3
    strength = max(0.0, 1.0 - ss_resid / ss_total)
    assert abs(r.seasonal_strength - strength) < 1e-5
    # residual variance can never exceed total under per-dow means
    assert r.var_resid <= r.var_total + 1e-9


def test_forecast_backtest_recompute(spark, sf_dir):
    out = parity.forecast_baseline_backtest(spark, sf_dir).toPandas()
    hist = _hist(sf_dir)
    y = hist.values.astype(int)
    rows = {r.model: r for r in out.itertuples()}
    for model, lag in (("naive", 1), ("seasonal_naive", 7)):
        ae = np.abs(y[lag:] - y[:-lag])
        actual = y[lag:]
        r = rows[model]
        assert r.n_points == len(ae)
        assert abs(r.mae - ae.mean()) < 1e-5
        mask = actual > 0
        mape = float(
            np.mean(
                np.round(ae[mask] / actual[mask].astype(float), 12)
            )
        )
        assert abs(r.mape - mape) < 1e-5


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_bloom_skipping_recompute(spark, sf_dir):
    out = relational.bloom_file_skipping_audit(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = set(o.o_orderkey)
    masks = {}
    for k in keys:
        f = _md5_52(f"{k}:file") % relational.BLOOM_FILES
        m = (1 << (_md5_52(f"{k}:b1") % relational.BLOOM_BITS)) | (
            1 << (_md5_52(f"{k}:b2") % relational.BLOOM_BITS)
        )
        masks[f] = masks.get(f, 0) | m
    assert len(out) == relational.BLOOM_N_PROBES
    any_fp = 0
    for r in out.itertuples():
        km = (
            1 << (_md5_52(f"{r.probe_key}:b1") % relational.BLOOM_BITS)
        ) | (1 << (_md5_52(f"{r.probe_key}:b2") % relational.BLOOM_BITS))
        passes = sum(
            1 for fm in masks.values() if (fm & km) == km
        )
        assert r.files_pass == passes
        assert r.key_exists == int(r.probe_key in keys)
        assert r.false_positives == passes - r.key_exists
        any_fp += r.false_positives
        # a present key's own file always passes (no false negatives)
        if r.key_exists:
            assert r.files_pass >= 1
    # saturated 63-bit masks over thousands of keys must show FPs
    assert any_fp > 0
