"""Tests: round-4 session-14 batch 45 (rank-statistics pack) — scipy-free
recomputes from first principles in pandas/numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_mann_whitney_recompute(spark, sf_dir):
    out = parity.mann_whitney_u(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    a = ev[ev["event_type"] == parity.MWU_TYPE_A]["value"].to_numpy()
    b = ev[ev["event_type"] == parity.MWU_TYPE_B]["value"].to_numpy()
    pooled = np.concatenate([a, b])
    order = pooled.argsort(kind="mergesort")
    ranks = np.empty(len(pooled))
    # tie-averaged ranks
    sv = pooled[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert int(out["n_a"].iloc[0]) == len(a)
    assert int(out["n_b"].iloc[0]) == len(b)
    assert abs(out["u_a"].iloc[0] - round(u_a, 2)) < 1e-6
    # z sanity: same sign and magnitude band as a direct recompute
    n = len(a) + len(b)
    _, t = np.unique(pooled, return_counts=True)
    tie3 = float((t**3 - t).sum())
    mu = len(a) * len(b) / 2.0
    sig2 = len(a) * len(b) / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u_a - mu) / np.sqrt(sig2)
    assert abs(out["z"].iloc[0] - z) < 1e-4


def _daily(sf_dir):
    ev = _events(sf_dir)
    d = ev.groupby(ev["ts"].dt.floor("D")).agg(
        cnt=("event_id", "size"), rev=("value", lambda s: s.round(2).sum())
    )
    return d


def test_spearman_recompute(spark, sf_dir):
    out = parity.spearman_rho_daily(spark, sf_dir).toPandas()
    d = _daily(sf_dir)
    rho = d["cnt"].rank().corr(d["rev"].rank())
    assert abs(out["spearman_rho"].iloc[0] - rho) < 1e-6


def test_kendall_recompute(spark, sf_dir):
    out = parity.kendall_tau_daily(spark, sf_dir).toPandas()
    d = _daily(sf_dir).reset_index()
    x, y = d["cnt"].to_numpy(), d["rev"].to_numpy()
    n = len(d)
    conc = disc = tie_x = tie_y = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = np.sign(x[i] - x[j])
            dy = np.sign(y[i] - y[j])
            if dx == 0:
                tie_x += 1
            if dy == 0:
                tie_y += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / np.sqrt((n0 - tie_x) * (n0 - tie_y))
    assert int(out["conc"].iloc[0]) == conc
    assert int(out["disc"].iloc[0]) == disc
    assert abs(out["kendall_tau_b"].iloc[0] - tau) < 1e-6


def test_benford_recompute(spark, sf_dir):
    out = relational.benford_first_digit(spark, sf_dir).toPandas()
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    od = od[od["o_totalprice"] >= 1.0]
    digits = od["o_totalprice"].astype(int).astype(str).str[0].astype(int)
    exp = digits.value_counts().to_dict()
    got = dict(zip(out["digit"], out["observed"]))
    assert got == {int(k): int(v) for k, v in exp.items()}
    n = len(od)
    for row in out.itertuples():
        assert abs(row.expected - n * relational.BENFORD_P[row.digit]) < 1e-4
    # chi2 equals the sum of the per-digit contributions
    assert abs(out["chi2"].iloc[0] - out["contrib"].sum()) < 1e-4


def test_histogram_quantile_recompute(spark, sf_dir):
    out = relational.histogram_quantile_audit(spark, sf_dir).toPandas()
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")["o_totalprice"]
    assert list(out["q"]) == list(relational.HISTQ_QS)
    for row in out.itertuples():
        exact = np.quantile(od.to_numpy(), row.q)  # type-7, matches percentile
        assert abs(row.exact_q - exact) < 1e-4
        # the approximation should be within one bucket width of exact
        width = (od.max() - od.min()) / relational.HISTQ_BINS
        assert abs(row.approx_q - exact) <= width + 1e-6
