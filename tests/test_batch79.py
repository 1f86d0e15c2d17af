"""Tests: round-4 session-16 batch 79 — Borda fusion, JL projection
audit, Bollinger bands."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity


def test_borda_recompute(spark, sf_dir):
    from lucene_mapreduce_spark.operators import fulltext

    depth = similarity.RRF_DEPTH
    lex = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=depth
    ).toPandas()
    vec = similarity.ann_bruteforce_topk(spark, sf_dir, k=depth).toPandas()
    out = similarity.borda_fusion_topk(spark, sf_dir).toPandas()
    lr = dict(zip(lex.doc_id, lex["rank"]))
    vr = dict(zip(vec.vec_id, vec["rank"]))
    scores = {
        d: similarity.BORDA_W_LEX * max(0, depth + 1 - lr.get(d, depth + 1))
        + similarity.BORDA_W_VEC * max(0, depth + 1 - vr.get(d, depth + 1))
        for d in set(lr) | set(vr)
    }
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.doc_id, r.borda) for r in out.itertuples()] == exp
    # integer scores: dtype must stay integral end to end
    assert out.borda.dtype.kind == "i"


def test_jl_projection_recompute(spark, sf_dir):
    out = similarity.jl_projection_audit(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    signs = np.array(similarity._jl_signs(), dtype=np.float64)
    proj = {
        vid: np.round(signs @ v * 0.25, 12) for vid, v in vecs.items()
    }
    n = len(vecs)
    mult = similarity.PAIR_HASH_MULT % n
    bins = {}
    for a_id in vecs:
        b_id = ((a_id % n) * mult) % n
        if b_id == a_id or b_id not in vecs:
            continue
        d2o = float(np.sum((vecs[a_id] - vecs[b_id]) ** 2))
        if d2o <= 0:
            continue
        d2p = float(np.sum((proj[a_id] - proj[b_id]) ** 2))
        b = math.floor(round(d2p / d2o, 6) * 10.0)
        bins[b] = bins.get(b, 0) + 1
    got = dict(zip(out.bin, out.n_pairs))
    assert got == bins
    # JL with k=16 should concentrate ratios around 1 (bin 10±)
    center = sum(v for k_, v in bins.items() if 5 <= k_ <= 15)
    assert center / sum(bins.values()) > 0.8


def test_bollinger_recompute(spark, sf_dir):
    out = parity.bollinger_bands_daily(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.floor("D")
    counts = days.value_counts().sort_index()
    cal = pd.date_range(counts.index.min(), counts.index.max(), freq="D")
    hist = counts.reindex(cal, fill_value=0)
    w = parity.BOLLINGER_WINDOW
    assert len(out) == max(0, len(hist) - w + 1)
    vals = hist.values.astype(float)
    for idx, r in enumerate(out.itertuples()):
        frame = vals[idx : idx + w]
        m = frame.sum() / w
        std = math.sqrt(
            (np.sum(frame * frame) - w * m * m) / (w - 1)
        )
        assert str(hist.index[idx + w - 1].date()) == r.day
        assert r.n_events == int(vals[idx + w - 1])
        assert abs(r.mean_w - m) < 5e-6
        assert abs(r.upper_band - (m + parity.BOLLINGER_NSIGMA * std)) < 5e-6
        assert abs(r.lower_band - (m - parity.BOLLINGER_NSIGMA * std)) < 5e-6
        exp_flag = int(
            vals[idx + w - 1] > m + parity.BOLLINGER_NSIGMA * std
            or vals[idx + w - 1] < m - parity.BOLLINGER_NSIGMA * std
        )
        assert r.out_of_band == exp_flag
