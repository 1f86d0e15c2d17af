"""Tests: round-4 session-17 batch 143 — Holm step-down, fixed-effect
meta-analysis, generalized ESD."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity


def test_holm_recompute(spark, sf_dir):
    out = parity.holm_bonferroni_gate(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for s in sorted(docs.source.unique()):
        u = int(hashlib.md5(f"{s}:bhfdr".encode()).hexdigest()[:13], 16)
        sig = (
            int(hashlib.md5(f"{s}:bhsig".encode()).hexdigest()[:13], 16)
            * parity.BH_PLANT_FRAC
            < 1 << 52
        )
        den = 1000 * (1 << 52) if sig else (1 << 52)
        ord_key = u * (1 if sig else 1000)
        rows.append((ord_key, s, u / den, sig))
    rows.sort()
    m = len(rows)
    run_max = 0.0
    still = True
    for i, (_, s, p, sig) in enumerate(rows, 1):
        run_max = min(max(run_max, (m - i + 1) * p), 1.0)
        if run_max > parity.HOLM_ALPHA:
            still = False
        r = out[out.i == i].iloc[0]
        assert r.source == s
        assert r.planted == int(sig)
        assert abs(r.p_value - p) < 1e-9
        assert abs(r.holm_adj_p - run_max) < 1e-9
        assert r.reject == int(still)
    # Holm never rejects more than BH at comparable levels; at least
    # the planted signals head the ranking
    assert out[out.reject == 1].planted.all() or out.reject.sum() == 0


def test_meta_fixed_recompute(spark, sf_dir):
    out = parity.meta_fixed_effect_or(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = {}
    for r in docs.itertuples():
        toks = set(tokenize_string(r.text))
        e = parity.MH_EXPOSURE_TOKEN in toks
        o = parity.MH_OUTCOME_TOKEN in toks
        c = cells.setdefault(r.lang, [0, 0, 0, 0])
        c[0 if (e and o) else 1 if e else 2 if o else 3] += 1
    lnors, ws = [], []
    for a, b, c, d in cells.values():
        ah, bh_, ch, dh = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        lnors.append(round(math.log(ah * dh / (bh_ * ch)), 12))
        ws.append(round(1.0 / (1 / ah + 1 / bh_ + 1 / ch + 1 / dh), 12))
    swl = sum(sorted(round(w * l, 12) for w, l in zip(ws, lnors)))
    sw = sum(sorted(ws))
    pooled = swl / sw
    q = sum(
        sorted(round(w * (l - pooled) ** 2, 12) for w, l in zip(ws, lnors))
    )
    k = len(cells)
    assert out.k == k
    assert abs(out.pooled_lnor - pooled) < 1e-6
    assert abs(out.pooled_or - math.exp(pooled)) < 1e-5
    assert abs(out.q_het - q) < 1e-6
    assert abs(out.i2 - max((q - (k - 1)) / q, 0.0)) < 1e-6


def test_gesd_recompute(spark, sf_dir):
    out = parity.gesd_outliers_3round(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    series = days.value_counts().reindex(cal, fill_value=0).sort_index()
    remaining = {
        d.strftime("%Y-%m-%d"): int(v) for d, v in series.items()
    }
    exp = []
    for rnd in range(1, parity.GESD_ROUNDS + 1):
        vals = list(remaining.values())
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(
            (sum(v * v for v in vals) - sum(vals) * mean) / (n - 1)
        )
        best = min(
            (
                (-round(abs(v - mean) / sd, 6), d)
                for d, v in remaining.items()
            ),
        )
        day = best[1]
        exp.append((rnd, day, remaining[day], -best[0], n))
        del remaining[day]
    got = [
        (int(r.round), r.day, int(r.n_events), round(float(r.r_stat), 6),
         int(r.n_remaining))
        for r in out.itertuples()
    ]
    assert got == exp
    # rounds shrink the sample by one each time
    assert [g[4] for g in got] == [
        len(cal), len(cal) - 1, len(cal) - 2,
    ]
