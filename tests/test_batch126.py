"""Tests: round-4 session-17 batch 126 — conformal calibration, Brier /
ECE report, Cronbach's alpha."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _daily(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    return days.value_counts().reindex(cal, fill_value=0).sort_index()


def test_conformal_recompute(spark, sf_dir):
    out = parity.conformal_interval_calibration(spark, sf_dir).toPandas().iloc[0]
    y = list(_daily(sf_dir).values)
    L = parity.CONFORMAL_LAG
    half = len(y) // 2
    cal_res = [
        abs(int(y[i]) - int(y[i - L]))
        for i in range(L, len(y))
        if i + 1 <= half
    ]
    test_res = [
        abs(int(y[i]) - int(y[i - L]))
        for i in range(L, len(y))
        if i + 1 > half
    ]
    n_cal = len(cal_res)
    k = min(((n_cal + 1) * 9 + 9) // 10, n_cal)
    q = sorted(cal_res)[k - 1]
    covered = sum(r <= q for r in test_res)
    assert (out.n_cal, out.n_test, out.q_hat) == (n_cal, len(test_res), q)
    assert out.n_covered == covered
    assert abs(out.coverage - covered / len(test_res)) < 1e-6
    # the split-conformal guarantee holds marginally; at n=30 just
    # sanity-check the interval is nondegenerate
    assert q >= 0


def test_brier_recompute(spark, sf_dir):
    out = parity.brier_calibration_report(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["value", "event_id"]).reset_index(drop=True)
    ev["p"] = ev.value / (ev.value + parity.BRIER_P_SHIFT)
    ev["y"] = (ev.event_type == "purchase").astype(int)
    n = len(ev)
    k = parity.BRIER_BINS
    base, extra = divmod(n, k)
    bins = []
    for b in range(1, k + 1):
        bins.extend([b] * (base + (1 if b <= extra else 0)))
    ev["bin"] = bins
    brier_sum = sum(
        sorted(round((p - y) ** 2, 12) for p, y in zip(ev.p, ev.y))
    )
    ece_sum = 0.0
    for b, grp in ev.groupby("bin"):
        mp = sum(sorted(round(p, 12) for p in grp.p)) / len(grp)
        fp = grp.y.sum() / len(grp)
        ece_sum += round(abs(mp - fp) * len(grp), 12)
        row = out[out.bin == b].iloc[0]
        assert row.n == len(grp)
        assert abs(row.mean_p - mp) < 1e-6
        assert row.n_pos == grp.y.sum()
        assert abs(row.frac_pos - fp) < 1e-6
        assert abs(row.abs_gap - abs(round(mp, 6) - round(fp, 6))) < 1e-6
    assert (out.n_total == n).all()
    assert abs(out.iloc[0].brier - brier_sum / n) < 1e-6
    assert abs(out.iloc[0].ece - ece_sum / n) < 1e-6
    # monotone bins: mean_p nondecreasing
    assert list(out.sort_values("bin").mean_p) == sorted(out.mean_p)


def test_cronbach_recompute(spark, sf_dir):
    out = parity.cronbach_alpha_daily(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type.isin(parity.CRONBACH_TYPES)]
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    # NOTE: grid calendar is the FULL event calendar (all types)
    ev_all = pd.read_parquet(f"{sf_dir}/events.parquet")
    cal = pd.date_range(
        ev_all.ts.dt.normalize().min(), ev_all.ts.dt.normalize().max(),
        freq="D",
    )
    k = len(parity.CRONBACH_TYPES)
    items = []
    for t in parity.CRONBACH_TYPES:
        s = (
            ev[ev.event_type == t].ts.dt.normalize().value_counts()
            .reindex(cal, fill_value=0)
            .sort_index()
        )
        items.append(s.astype(int))
    sum_var = sum(round(float(s.var(ddof=1)), 12) for s in items)
    tot = sum(items)
    var_tot = float(tot.var(ddof=1))
    alpha = k / (k - 1) * (1 - sum_var / var_tot)
    assert (out.n_days, out.k_items) == (len(cal), k)
    assert abs(out.sum_var_items - sum_var) < 1e-5
    assert abs(out.var_total - var_tot) < 1e-5
    assert abs(out.alpha - alpha) < 1e-5
    assert out.alpha <= 1.0
