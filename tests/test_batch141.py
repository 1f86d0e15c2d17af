"""Tests: round-4 session-17 batch 141 — gains/lift, exact AUC,
energy distance."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _scored(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(
        p=ev.value / (ev.value + parity.BRIER_P_SHIFT),
        y=(ev.event_type == "purchase").astype(int),
    )
    return ev


def _ntile(n, k):
    base, extra = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


def test_gains_recompute(spark, sf_dir):
    out = parity.cumulative_gains_deciles(spark, sf_dir).toPandas()
    ev = _scored(sf_dir).sort_values(
        ["p", "event_id"], ascending=[False, True]
    ).reset_index(drop=True)
    ev["decile"] = _ntile(len(ev), parity.BRIER_BINS)
    pt = ev.y.sum()
    nt = len(ev)
    cum_n = cum_pos = 0
    for r in out.itertuples():
        grp = ev[ev.decile == r.decile]
        cum_n += len(grp)
        cum_pos += grp.y.sum()
        assert (r.n, r.n_pos) == (len(grp), grp.y.sum())
        assert r.cum_pos == cum_pos
        assert abs(r.gain - cum_pos / pt) < 1e-6
        assert abs(r.lift - (cum_pos / pt) / (cum_n / nt)) < 1e-6
    # gains are monotone and end at 1
    assert abs(out.gain.iloc[-1] - 1.0) < 1e-9
    assert list(out.gain) == sorted(out.gain)


def test_auc_recompute(spark, sf_dir):
    out = parity.score_auc_exact(spark, sf_dir).toPandas().iloc[0]
    ev = _scored(sf_dir)
    vals = sorted(ev.p)
    # doubled midranks via rank_min + ties
    from bisect import bisect_left, bisect_right

    r2_pos = 0
    for p, y in zip(ev.p, ev.y):
        if y:
            lo = bisect_left(vals, p)
            hi = bisect_right(vals, p)
            r2_pos += 2 * (lo + 1) + (hi - lo) - 1
    n_pos = int(ev.y.sum())
    n_neg = len(ev) - n_pos
    auc = (r2_pos / 2.0 - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    assert (out.n_pos, out.n_neg, out.r2_pos) == (n_pos, n_neg, r2_pos)
    assert abs(out.auc - auc) < 1e-6
    assert abs(out.gini_coef - (2 * auc - 1)) < 1e-6
    assert 0 <= out.auc <= 1


def test_energy_recompute(spark, sf_dir):
    out = parity.energy_distance_values(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x = sorted(
        int(round(v * 100))
        for v in ev[ev.event_type == parity.DCOR_TYPE_X].value
    )
    y = sorted(
        int(round(v * 100))
        for v in ev[ev.event_type == parity.DCOR_TYPE_Y].value
    )
    grid = sorted(set(x) | set(y))
    cx, cy = Counter(x), Counter(y)
    fa = fb = 0
    exy = exx = eyy = 0.0
    for v, nxt in zip(grid, grid[1:]):
        fa += cx[v]
        fb += cy[v]
        FA, FB = fa / len(x), fb / len(y)
        gap = nxt - v
        exy += round((FA + FB - 2 * FA * FB) * gap, 12)
        exx += round(2 * FA * (1 - FA) * gap, 12)
        eyy += round(2 * FB * (1 - FB) * gap, 12)
    assert (out.n_x, out.n_y) == (len(x), len(y))
    assert abs(out.e_abs_xy - exy / 100) < 1e-6
    assert abs(out.e_abs_xx - exx / 100) < 1e-6
    assert abs(out.e_abs_yy - eyy / 100) < 1e-6
    energy = (2 * exy - exx - eyy) / 100
    assert abs(out.energy_distance - energy) < 1e-6
    # energy distance is nonnegative
    assert out.energy_distance >= -1e-9
    # brute-force sanity on E|X-Y| via a small subsample identity:
    # E|X-X'| uses the with-replacement convention (n^2 pairs)
    import numpy as np

    xa = np.array(x, dtype=float)
    exx_bf = float(np.abs(xa[:, None] - xa[None, :]).mean()) / 100
    assert abs(out.e_abs_xx - exx_bf) < 1e-6
