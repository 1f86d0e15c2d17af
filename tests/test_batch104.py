"""Tests: round-4 session-16 batch 104 — stopword pruning plan,
winsorized mean, embedding lag-1 coherence."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, similarity


def test_stopword_plan_recompute(spark, sf_dir):
    out = fulltext.stopword_pruning_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df = {}
    for t in docs.text:
        for tok in set(tokenize_string(t)):
            df[tok] = df.get(tok, 0) + 1
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(df.values())
    assert len(out) == len(fulltext.STOPWORD_KS)
    for r in out.itertuples():
        dropped = sum(c for _, c in ranked[: r.k])
        assert r.dropped == dropped
        assert r.total_postings == total
        assert abs(r.fraction_saved - dropped / total) < 5e-7
    # fractions must be monotone in k
    assert list(out.fraction_saved) == sorted(out.fraction_saved)


def test_winsorized_mean_recompute(spark, sf_dir):
    out = parity.winsorized_mean_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = ev.value.astype(float).values
    lo = float(np.quantile(v, parity.WINSOR_P[0]))
    hi = float(np.quantile(v, parity.WINSOR_P[1]))
    w = np.clip(v, lo, hi)
    assert r.n == len(v)
    assert r.n_clipped_low == int((v < lo).sum())
    assert r.n_clipped_high == int((v > hi).sum())
    assert abs(r.raw_mean - np.round(v, 6).mean()) < 1e-5
    assert abs(r.winsorized_mean - np.round(w, 6).mean()) < 1e-5


def test_lag1_coherence_recompute(spark, sf_dir):
    out = similarity.embedding_lag1_coherence(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        v: np.asarray(e, dtype=np.float64)
        for v, e in zip(emb.vec_id, emb.embedding)
    }
    n = len(vecs)

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    lag = [
        cos(vecs[i], vecs[i + 1]) for i in sorted(vecs) if i + 1 in vecs
    ]
    mult = similarity.PAIR_HASH_MULT % n
    base = []
    for i in sorted(vecs):
        j = ((i % n) * mult) % n
        if j != i and j in vecs:
            base.append(cos(vecs[i], vecs[j]))
    assert r.n_lag1 == len(lag)
    assert r.n_baseline == len(base)
    assert abs(r.lag1_mean_cosine - sum(lag) / len(lag)) < 1e-5
    assert abs(
        r.baseline_mean_cosine - sum(base) / len(base)
    ) < 1e-5
    # random synthetic embeddings: no sequential locality expected
    assert abs(r.coherence_gap) < 0.1
