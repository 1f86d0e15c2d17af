"""Tests: round-4 session-15 batch 73 — bounce rate, triplet mining,
feature-hash collision report."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, similarity, textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_bounce_rate_recompute(spark, sf_dir):
    out = parity.bounce_rate_by_entry(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    gap = parity.SESSION_GAP_S * 10**6
    stats: dict[str, list[int]] = {}
    for _, g in ev.groupby("user_id"):
        entry, n, prev = None, 0, None
        for r in g.itertuples():
            if prev is None or r.us - prev >= gap:
                if entry is not None:
                    stats.setdefault(entry, []).append(n)
                entry, n = r.event_type, 0
            n += 1
            prev = r.us
        stats.setdefault(entry, []).append(n)
    assert len(out) == len(stats)
    for r in out.itertuples():
        runs = stats[r.entry]
        assert r.n_sessions == len(runs)
        assert r.n_bounced == sum(1 for x in runs if x == 1)
        assert abs(r.bounce_rate - r.n_bounced / r.n_sessions) < 5e-7


def test_triplet_mining_recompute(spark, sf_dir):
    out = similarity.triplet_mining_plan(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(emb.embedding.values).astype(float)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = emb.vec_id.values
    labels = emb.label.values
    got = {r.anchor_id: r for r in out.itertuples()}
    for ai, a in enumerate(ids):
        if a % similarity.TRIPLET_MOD != 0:
            continue
        sims = np.round(V @ V[ai], 6)
        same = (labels == labels[ai]) & (ids != a)
        if not same.any():
            assert a not in got
            continue
        # rank on (rounded sim desc, vec_id asc)
        cand = sorted(
            zip(-sims[same], ids[same])
        )
        pos_sim, pos_id = -cand[0][0], cand[0][1]
        diff = (labels != labels[ai]) & (sims < pos_sim)
        if not diff.any():
            assert a not in got
            continue
        ncand = sorted(zip(-sims[diff], ids[diff]))
        neg_sim, neg_id = -ncand[0][0], ncand[0][1]
        r = got[a]
        assert r.pos_id == pos_id and r.neg_id == neg_id
        assert abs(r.pos_sim - pos_sim) < 2e-6
        assert abs(r.neg_sim - neg_sim) < 2e-6
        assert abs(r.triplet_gap - round(r.pos_sim - r.neg_sim, 6)) < 1e-9
        assert r.semi_hard == int(
            r.pos_sim - r.neg_sim < similarity.TRIPLET_MARGIN
        )
    # positives always outrank their negatives
    assert (out.pos_sim > out.neg_sim).all()


def test_feature_hash_recompute(spark, sf_dir):
    out = textstats.feature_hash_collision_report(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf: dict[str, int] = {}
    for t in docs.text:
        for w in tokenize_string(t):
            cf[w] = cf.get(w, 0) + 1
    loads: dict[int, int] = {}
    mass: dict[int, int] = {}
    for w, c in cf.items():
        b = _md5_52(w) % textstats.FEATURE_HASH_BUCKETS
        loads[b] = loads.get(b, 0) + 1
        mass[b] = mass.get(b, 0) + c
    hist: dict[int, list[int]] = {}
    for b, ld in loads.items():
        hist.setdefault(ld, [0, 0])
        hist[ld][0] += 1
        hist[ld][1] += mass[b]
    n_empty = textstats.FEATURE_HASH_BUCKETS - len(loads)
    if n_empty:
        hist[0] = [n_empty, 0]
    assert {
        r.load: (r.n_buckets, r.token_mass) for r in out.itertuples()
    } == {k: tuple(v) for k, v in hist.items()}
    # bucket accounting closes: sum(load * n_buckets) == vocab size
    assert sum(r.load * r.n_buckets for r in out.itertuples()) == len(cf)
    assert out.token_mass.sum() == sum(cf.values())
