"""Tests: round-4 session-18 batch 167 — Bass, AUC CI, MCC/F1."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_bass_recompute(spark, sf_dir):
    out = parity.bass_diffusion_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    fd = ed.groupby(ev.user_id).min()
    cal = range(int(ed.min()), int(ed.max()) + 1)
    y = fd.value_counts().reindex(cal, fill_value=0).sort_index().to_numpy()
    x = np.concatenate([[0], np.cumsum(y)[:-1]]).astype(float)
    assert out.n_days == len(y)
    assert out.n_adopters == y.sum()
    if len(set(x)) < 3:
        # singular normal equations: the engine reports honest NULLs
        assert pd.isna(out.coef_a) and pd.isna(out.market_m)
        return
    coef = np.polyfit(x, y, 2)  # [c, b, a]
    cc, bb, a = coef
    assert abs(out.coef_a - a) < 1e-3
    assert abs(out.coef_b - bb) < 1e-5
    assert abs(out.coef_c - cc) < 1e-7
    m = (-bb - math.sqrt(bb * bb - 4 * a * cc)) / (2 * cc)
    assert abs(out.market_m - m) < max(1e-2, abs(m) * 1e-4)
    assert abs(out.innovation_p - a / m) < 1e-4
    assert abs(out.imitation_q - (-cc * m)) < 1e-4
    # the fitted market size should at least cover observed adopters
    assert out.market_m >= out.n_adopters * 0.5


def test_auc_ci_recompute(spark, sf_dir):
    out = parity.auc_hanley_mcneil_ci(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = (ev.value * 100).round(0).astype("int64")
    y = (ev.event_type == "purchase").astype(int)
    r = cents.rank(method="average")
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (r[y == 1].sum() - n1 * (n1 + 1) / 2) / (n0 * n1)
    q1 = auc / (2 - auc)
    q2 = 2 * auc * auc / (1 + auc)
    se = math.sqrt(
        (auc * (1 - auc) + (n1 - 1) * (q1 - auc**2)
         + (n0 - 1) * (q2 - auc**2)) / (n0 * n1)
    )
    assert (out.n_positive, out.n_negative) == (n1, n0)
    assert abs(out.auc - auc) < 1e-6
    assert abs(out.se_hanley_mcneil - se) < 1e-6
    assert abs(out.ci_lower - (auc - 1.96 * se)) < 1e-5
    assert abs(out.ci_upper - (auc + 1.96 * se)) < 1e-5


def test_mcc_f1_recompute(spark, sf_dir):
    out = parity.mcc_f1_threshold_panel(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pred = ((ev.value * 100).round(0).astype("int64") > 5000).astype(int)
    y = (ev.event_type == "purchase").astype(int)
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    tn = int(((pred == 0) & (y == 0)).sum())
    assert (out.tp, out.fp, out.fn, out.tn) == (tp, fp, fn, tn)
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert abs(out.precision - prec) < 1e-6
    assert abs(out.recall - rec) < 1e-6
    assert abs(out.f1 - 2 * prec * rec / (prec + rec)) < 1e-6
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(out.mcc - mcc) < 1e-6
    assert -1 <= out.mcc <= 1
