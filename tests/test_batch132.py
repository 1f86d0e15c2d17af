"""Tests: round-4 session-17 batch 132 — Erlang-C staffing, Theta
backtest, binseg changepoint."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    return days.value_counts().reindex(cal, fill_value=0).sort_index()


def test_erlang_recompute(spark, sf_dir):
    out = parity.erlang_c_staffing(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    peak = int(pd.Series(us // 3_600_000_000).value_counts().max())
    a = peak / 3600.0 / parity.ERLANG_MU_PER_S
    assert len(out) == parity.ERLANG_MAX_C
    for r in out.itertuples():
        c = int(r.servers)
        assert r.peak == peak
        assert abs(r.offered_load - a) < 1e-6
        if a >= c:
            assert r.p_wait == 1.0 and r.stable == 0
        else:
            terms = [a**k / math.factorial(k) for k in range(c)]
            top = a**c / math.factorial(c) * (c / (c - a))
            p = top / (sum(terms) + top)
            assert abs(r.p_wait - p) < 1e-5
            assert r.stable == 1
    # p_wait is monotone nonincreasing in servers once stable
    st = out[out.stable == 1].sort_values("servers")
    assert list(st.p_wait) == sorted(st.p_wait, reverse=True)


def test_theta_recompute(spark, sf_dir):
    out = parity.theta_forecast_backtest(spark, sf_dir).toPandas().iloc[0]
    y = [int(v) for v in _daily(sf_dir).values]
    n = len(y)
    h = n - parity.THETA_H_TEST
    train = y[:h]
    al = parity.THETA_ALPHA
    level = float(train[0])
    for v in train[1:]:
        level = al * v + (1 - al) * level
    si = sum(range(1, h + 1))
    sii = sum(i * i for i in range(1, h + 1))
    sy = sum(train)
    siy = sum(i * v for i, v in enumerate(train, 1))
    b = (h * siy - si * sy) / (h * sii - si * si)
    br, lr = round(b, 12), round(level, 12)
    damp = round((1.0 - math.exp(h * parity.THETA_LN_1MA)) / al, 12)
    errs = []
    for j, v in enumerate(y[h:], 1):
        f = lr + (br / 2.0) * ((j - 1.0) + damp)
        errs.append(round(abs(v - f), 12))
    mae = sum(sorted(errs)) / len(errs)
    assert (out.n_train, out.n_test) == (h, parity.THETA_H_TEST)
    assert abs(out.ses_level - level) < 1e-6
    assert abs(out.trend_slope - b) < 1e-6
    assert abs(out.mae - mae) < 1e-6


def test_binseg_recompute(spark, sf_dir):
    out = parity.binseg_changepoint(spark, sf_dir).toPandas().iloc[0]
    series = _daily(sf_dir)
    y = [int(v) for v in series.values]
    n = len(y)
    s = sum(y)
    best = None
    sk = 0
    for k in range(1, n):
        sk += y[k - 1]
        num = n * sk - k * s
        gain = round((num * num) / (n * k * (n - k)), 6)
        if best is None or gain > best[0]:
            best = (gain, k, sk)
    gain, k, sk = best
    assert out.n_days == n
    assert out.split_k == k
    assert out.split_after_day == series.index[k - 1].strftime("%Y-%m-%d")
    assert abs(out.gain - gain) < 1e-6
    assert abs(out.mean_left - sk / k) < 1e-6
    assert abs(out.mean_right - (s - sk) / (n - k)) < 1e-6
    # gain equals the SSE reduction of the two-segment fit
    mean = s / n
    sse0 = sum((v - mean) ** 2 for v in y)
    ml, mr = sk / k, (s - sk) / (n - k)
    sse1 = sum((v - ml) ** 2 for v in y[:k]) + sum(
        (v - mr) ** 2 for v in y[k:]
    )
    assert abs((sse0 - sse1) - out.gain) < 1e-3
