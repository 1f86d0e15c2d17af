"""Tests: round-4 session-16 batch 109 — source minhash, pinball loss."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, parity


def test_source_minhash_recompute(spark, sf_dir):
    out = dedup.source_minhash_jaccard(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    K = dedup.SHINGLE_K
    src_sh = {}
    for src, g in docs.groupby("source"):
        sset = set()
        for t in g.text:
            toks = tokenize_string(t)
            for i in range(len(toks) - K + 1):
                sset.add(" ".join(toks[i : i + K]))
        src_sh[src] = sset
    sigs = {
        src: [
            min(
                hashlib.md5(f"{i}:{sh}".encode()).hexdigest()
                for sh in sset
            )
            for i in range(dedup.N_MINHASH)
        ]
        for src, sset in src_sh.items()
        if sset
    }
    srcs = sorted(sigs)
    exp_pairs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    assert len(out) == len(exp_pairs)
    rows = {(r.sa, r.sb): r for r in out.itertuples()}
    for a, b in exp_pairs:
        r = rows[(a, b)]
        inter = len(src_sh[a] & src_sh[b])
        union = len(src_sh[a] | src_sh[b])
        est = sum(
            1
            for i in range(dedup.N_MINHASH)
            if sigs[a][i] == sigs[b][i]
        ) / dedup.N_MINHASH
        assert r.n_inter == inter
        assert abs(r.exact_jaccard - inter / union) < 5e-7
        assert abs(r.mh_estimate - est) < 5e-7


def test_pinball_recompute(spark, sf_dir):
    out = parity.pinball_loss_backtest(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    eday = ev.ts.astype("int64") // 86400000000
    counts = eday.value_counts().sort_index()
    idx = np.arange(counts.index.min(), counts.index.max() + 1)
    y = counts.reindex(idx, fill_value=0).values.astype(float)
    q = parity.PINBALL_Q
    rows = {r.model: r for r in out.itertuples()}
    for model, lag in (("naive", 1), ("seasonal_naive", 7)):
        d = y[lag:] - y[:-lag]
        loss = [
            round(q * x if x >= 0 else (1 - q) * (-x), 12) for x in d
        ]
        r = rows[model]
        assert r.n_points == len(loss)
        assert abs(r.mean_pinball_loss - sum(loss) / len(loss)) < 1e-5
