"""Tests: round-4 session-18 batch 173 — Spiegelhalter, reciprocity, MMD."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity


def test_spiegelhalter_recompute(spark, sf_dir):
    out = parity.spiegelhalter_z_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev.value / (ev.value + 50.0)
    y = (ev.event_type == "purchase").astype(int)
    num = ((y - p) * (1 - 2 * p)).sum()
    den = ((1 - 2 * p) ** 2 * p * (1 - p)).sum()
    z = num / math.sqrt(den)
    assert out.n_events == len(ev)
    assert out.n_positive == y.sum()
    assert abs(out.sum_residual_term - num) < 1e-5
    assert abs(out.spiegelhalter_z - z) < 1e-5


def test_reciprocity_recompute(spark, sf_dir):
    out = parity.transition_reciprocity(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    tc = Counter()
    for _, g in ev.groupby("user_id"):
        types = list(g.event_type)
        for a, b in zip(types, types[1:]):
            if a != b:
                tc[(a, b)] += 1
    total = sum(tc.values())
    rec = sum(min(c, tc.get((t, s), 0)) for (s, t), c in tc.items())
    assert out.n_directed_pairs == len(tc)
    assert out.total_edges == total
    assert out.reciprocated == rec
    assert abs(out.reciprocity - rec / total) < 1e-6
    assert 0 <= out.reciprocity <= 1


def test_mmd_recompute(spark, sf_dir):
    out = similarity.mmd_rbf_drift(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    halves = {0: [], 1: []}
    for r in emb.itertuples():
        h = md5i(f"mmd:{r.vec_id}") % 2
        halves[h].append(
            (hashlib.md5(f"mmds:{r.vec_id}".encode()).hexdigest(),
             r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )
    xs = [v for _, _, v in sorted(halves[0])[: similarity.MMD_SAMPLE]]
    ys = [v for _, _, v in sorted(halves[1])[: similarity.MMD_SAMPLE]]

    def k(a, b):
        d2 = round(
            float(np.dot(a, a) + np.dot(b, b) - 2 * np.dot(a, b)), 9
        )
        return math.exp(-d2 / (2 * similarity.MMD_SIGMA2))

    m, n = len(xs), len(ys)
    sxx = sum(k(a, b) for i, a in enumerate(xs)
              for j, b in enumerate(xs) if i != j)
    syy = sum(k(a, b) for i, a in enumerate(ys)
              for j, b in enumerate(ys) if i != j)
    sxy = sum(k(a, b) for a in xs for b in ys)
    mmd2 = sxx / (m * (m - 1)) + syy / (n * (n - 1)) - 2 * sxy / (m * n)
    assert (out.m_sample, out.n_sample) == (m, n)
    assert abs(out.mmd2 - mmd2) < 1e-5
    assert abs(out.mmd - math.sqrt(max(mmd2, 0.0))) < 1e-5
    # md5 halves are exchangeable draws: MMD should be tiny
    assert out.mmd < 0.2
