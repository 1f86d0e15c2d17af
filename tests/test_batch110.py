"""Tests: round-4 session-17 batch 110 — nonparametric trio (Kruskal-
Wallis H, McNemar paired days, Cliff's delta)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_kruskal_wallis_recompute(spark, sf_dir):
    out = parity.kruskal_wallis_h(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    r = ev["value"].rank(method="average")
    n = len(ev)
    s = 0.0
    for _, g in ev.assign(r=r).groupby("event_type"):
        s += g["r"].sum() ** 2 / len(g)
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    t = ev["value"].value_counts().to_numpy()
    corr = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    row = out.iloc[0]
    assert row.n_groups == ev["event_type"].nunique()
    assert row.n == n
    assert abs(row.h - h) < 1e-4
    assert abs(row.h_corrected - h / corr) < 1e-4
    # 5 groups drawn from the same value generator: H near its df mean,
    # far from pathological blowup
    assert 0.0 <= row.h_corrected < 100.0


def test_mcnemar_recompute(spark, sf_dir):
    out = parity.mcnemar_paired_days(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ud = ev.assign(day=ev.ts.dt.floor("D")).groupby(["user_id", "day"])[
        "event_type"
    ].agg(lambda s: (("purchase" in set(s)), ("error" in set(s))))
    a = np.array([x[0] for x in ud])
    b = np.array([x[1] for x in ud])
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    assert out.n_pairs == len(ud)
    assert out.n11 == int((a & b).sum())
    assert (out.n10, out.n01) == (n10, n01)
    assert out.n00 == int((~a & ~b).sum())
    assert out.n_pairs == out.n11 + out.n10 + out.n01 + out.n00
    exp = (abs(n10 - n01) - 1.0) ** 2 / (n10 + n01) if n10 + n01 else 0.0
    assert abs(out.chi2_cc - exp) < 1e-6
    # discordant cells must carry real mass for the test to mean anything
    assert n10 + n01 > 10


def test_cliffs_delta_recompute(spark, sf_dir):
    out = parity.cliffs_delta_effect(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x = np.sort(ev.loc[ev.event_type == "purchase", "value"].to_numpy())
    y = np.sort(ev.loc[ev.event_type == "click", "value"].to_numpy())
    # #(x>y) via searchsorted on the sorted click leg
    gt = int(np.searchsorted(y, x, side="left").sum())
    lt = int((len(y) - np.searchsorted(y, x, side="right")).sum())
    delta = (gt - lt) / (len(x) * len(y))
    assert (out.n_a, out.n_b) == (len(x), len(y))
    assert abs(out.delta - delta) < 1e-6
    thr = abs(round(delta, 6))
    exp_mag = (
        "negligible" if thr < 0.147
        else "small" if thr < 0.33
        else "medium" if thr < 0.474
        else "large"
    )
    assert out.magnitude == exp_mag
