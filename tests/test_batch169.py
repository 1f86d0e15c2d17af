"""Tests: round-4 session-18 batch 169 — ZIP, Lorenz asymmetry, diversity."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_zip_fit_recompute(spark, sf_dir):
    out = parity.zip_moment_fit(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    cells = []
    for _, g in ed.groupby(ev.user_id):
        cells.extend(g.value_counts().reindex(cal, fill_value=0))
    n = len(cells)
    m = sum(cells) / n
    v = sum((c - m) ** 2 for c in cells) / (n - 1)
    lam = (v + m * m - m) / m
    assert out.n_cells == n
    assert out.n_zero_cells == sum(1 for c in cells if c == 0)
    assert abs(out["mean"] - m) < 1e-6  # Series.mean is a method
    assert abs(out.variance - v) < 1e-5
    if lam > m:
        assert abs(out.zip_lambda - lam) < 1e-4
        assert abs(out.zip_pi_zero - (1 - m / lam)) < 1e-5
        # the ZIP zero fraction should land near the observed one
        pred = out.zip_pi_zero + (1 - out.zip_pi_zero) * math.exp(
            -out.zip_lambda
        )
        assert abs(pred - out.observed_zero_frac) < 0.25
    else:
        assert pd.isna(out.zip_lambda)


def test_lorenz_asymmetry_recompute(spark, sf_dir):
    out = parity.lorenz_asymmetry(spark, sf_dir).toPandas().iloc[0]
    v = sorted(
        pd.read_parquet(f"{sf_dir}/orders.parquet").o_totalprice.round(2)
    )
    n = len(v)
    mu = sum(v) / n
    below = [x for x in v if x < mu]
    m = len(below)
    delta = (mu - below[-1]) / (min(x for x in v if x >= mu) - below[-1])
    f_mu = (m + delta) / n
    l_mu = (sum(below) + delta * mu) / sum(v)
    assert out.n_orders == n
    assert abs(out.mean_value - mu) < 1e-4
    assert abs(out.f_mu - f_mu) < 1e-6
    assert abs(out.l_mu - l_mu) < 1e-6
    assert abs(out.lorenz_asymmetry - (f_mu + l_mu)) < 1e-6
    assert out.f_mu > out.l_mu  # below-mean orders hold less revenue share


def test_diversity_panel_recompute(spark, sf_dir):
    out = textstats.ecological_diversity_panel(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    src = out.source.iloc[0]
    cnt = Counter()
    for r in docs[docs.source == src].itertuples():
        cnt.update(tokenize_string(r.text))
    n = sum(cnt.values())
    h = sum(-(c / n) * math.log(c / n) for c in cnt.values())
    gs = 1 - sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
    row = out[out.source == src].iloc[0]
    assert row.n_tokens == n
    assert row.richness == len(cnt)
    assert abs(row.shannon_h - h) < 1e-6
    assert abs(row.gini_simpson - gs) < 1e-6
    assert abs(row.berger_parker - max(cnt.values()) / n) < 1e-6
    assert abs(row.pielou_evenness - h / math.log(len(cnt))) < 1e-6
    assert (out.pielou_evenness <= 1 + 1e-9).all()
