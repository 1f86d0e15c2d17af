"""Tests: round-4 session-17 batch 144 — Benford-2, runs up-down,
MASE."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    return [
        int(v)
        for v in days.value_counts().reindex(cal, fill_value=0).sort_index()
    ]


def test_benford2_recompute(spark, sf_dir):
    out = parity.benford_second_digit(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = [int(round(v * 100)) for v in o.o_totalprice]
    digs = Counter(
        int(str(c)[1]) for c in cents if len(str(c)) >= 2
    )
    n = sum(digs.values())
    chi = sum(
        sorted(
            round(
                (digs.get(d, 0) - parity.BENFORD2_P[d] * n) ** 2
                / (parity.BENFORD2_P[d] * n),
                12,
            )
            for d in digs
        )
    )
    assert list(out.digit) == sorted(digs)
    for r in out.itertuples():
        assert r.observed == digs[r.digit]
        assert abs(r.expected - parity.BENFORD2_P[r.digit] * n) < 1e-5
        assert abs(r.chi2_stat - chi) < 1e-5
    # second-digit probabilities sum to 1
    assert abs(sum(parity.BENFORD2_P) - 1.0) < 1e-12


def test_runs_updown_recompute(spark, sf_dir):
    out = parity.runs_updown_test(spark, sf_dir).toPandas().iloc[0]
    y = _daily(sf_dir)
    signs = [
        1 if b > a else 0 for a, b in zip(y, y[1:]) if b != a
    ]
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    n = len(signs) + 1
    mu = (2.0 * n - 1.0) / 3.0
    var = (16.0 * n - 29.0) / 90.0
    assert out.n_diffs == len(signs)
    assert out.n_runs == runs
    assert abs(out.expected_runs - mu) < 1e-6
    assert abs(out.z_stat - (runs - mu) / math.sqrt(var)) < 1e-6


def test_mase_recompute(spark, sf_dir):
    out = parity.mase_backtest(spark, sf_dir).toPandas().iloc[0]
    y = _daily(sf_dir)
    n = len(y)
    h = n - 7
    test_errs = [
        abs(y[i] - y[i - 7]) for i in range(n) if i + 1 > h and i >= 7
    ]
    train_errs = [
        abs(y[i] - y[i - 1]) for i in range(1, n) if i + 1 <= h
    ]
    mae_m = sum(test_errs) / len(test_errs)
    mae_n = sum(train_errs) / len(train_errs)
    assert (out.n_train, out.n_test) == (len(train_errs), len(test_errs))
    assert abs(out.mae_model - mae_m) < 1e-6
    assert abs(out.mae_naive_insample - mae_n) < 1e-6
    assert abs(out.mase - mae_m / mae_n) < 1e-6
    assert out.mase > 0
