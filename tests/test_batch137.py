"""Tests: round-4 session-17 batch 137 — tail dependence, GPD POT fit,
records test."""

from __future__ import annotations

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


def test_tail_dependence_recompute(spark, sf_dir):
    out = parity.tail_dependence_daily(spark, sf_dir).toPandas().iloc[0]
    x = _series(sf_dir, parity.DCOR_TYPE_X)
    y = _series(sf_dir, parity.DCOR_TYPE_Y)
    q = parity.TAIL_DEP_Q * 100
    qx, qy = np.percentile(x, q), np.percentile(y, q)
    px, py = np.percentile(x, 100 - q), np.percentile(y, 100 - q)
    n_up_x = int((x > qx).sum())
    n_up_both = int(((x > qx) & (y > qy)).sum())
    n_lo_x = int((x <= px).sum())
    n_lo_both = int(((x <= px) & (y <= py)).sum())
    assert out.n_days == len(x)
    assert abs(out.qx - qx) < 1e-6 and abs(out.qy - qy) < 1e-6
    assert (out.n_up_x, out.n_up_both) == (n_up_x, n_up_both)
    assert (out.n_lo_x, out.n_lo_both) == (n_lo_x, n_lo_both)
    assert abs(out.lambda_upper - n_up_both / n_up_x) < 1e-6
    assert abs(out.lambda_lower - n_lo_both / n_lo_x) < 1e-6
    assert 0 <= out.lambda_upper <= 1 and 0 <= out.lambda_lower <= 1


def test_gpd_recompute(spark, sf_dir):
    out = parity.gpd_pot_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    u = float(np.percentile(ev.value, parity.GPD_THRESHOLD_Q * 100))
    exc = ev.value[ev.value > u] - u
    n = len(exc)
    s = sum(sorted(round(float(e), 6) for e in exc))
    ss = sum(sorted(round(float(e) * float(e), 12) for e in exc))
    m = s / n
    s2 = (ss - s * m) / (n - 1)
    ratio = m * m / s2
    assert abs(out.threshold - u) < 1e-6
    assert out.n_exceed == n
    assert abs(out.mean_excess - m) < 1e-6
    assert abs(out.var_excess - s2) < 1e-5
    assert abs(out.xi - (1 - ratio) / 2) < 1e-5
    assert abs(out.sigma - m * (1 + ratio) / 2) < 1e-4
    # near-uniform values: xi should sit close to the uniform's -1 ...
    # just pin a sane band
    assert -2 < out.xi < 1


def test_records_recompute(spark, sf_dir):
    out = parity.records_test_daily(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index().values
    run = None
    rec = 0
    for v in y:
        if run is None or v > run:
            rec += 1
            run = v
        run = max(run, v)
    n = len(y)
    hn = sum(sorted(round(1.0 / i, 12) for i in range(1, n + 1)))
    hn2 = sum(sorted(round(1.0 / (i * i), 12) for i in range(1, n + 1)))
    assert out.n_days == n
    assert out.n_records == rec
    assert abs(out.expected_records - hn) < 1e-6
    assert abs(out.var_records - (hn - hn2)) < 1e-6
    assert abs(out.z_stat - (rec - hn) / math.sqrt(hn - hn2)) < 1e-6
    # the first day is always a record
    assert out.n_records >= 1
