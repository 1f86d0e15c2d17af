"""Tests: round-4 session-18 batch 153 — Taylor's law, two-NN, JSD."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, similarity, textstats


def test_taylor_recompute(spark, sf_dir):
    out = parity.taylor_power_law(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    us, ws = [], []
    for _, g in ed.groupby(ev.user_id):
        c = g.value_counts().reindex(cal, fill_value=0)
        mean, var = c.mean(), c.var(ddof=1)
        if c.sum() > 0 and var > 0:
            us.append(math.log(mean))
            ws.append(math.log(var))
    k = len(us)
    b, a = np.polyfit(us, ws, 1)
    assert out.n_users_fit == k
    assert abs(out.taylor_b - b) < 1e-5
    assert abs(out.ln_a - a) < 1e-5
    r = np.corrcoef(us, ws)[0, 1]
    assert abs(out.r2 - r * r) < 1e-5
    assert 0 < out.taylor_b < 3


def test_two_nn_recompute(spark, sf_dir):
    out = similarity.two_nn_intrinsic_dim(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    keyed = sorted(
        vecs,
        key=lambda i: (hashlib.md5(f"{i}:2nn".encode()).hexdigest(), i),
    )
    probes = keyed[: similarity.TWO_NN_PROBES]
    slm = 0.0
    for p in probes:
        d2s = sorted(
            round(float(np.dot(v, v) + np.dot(vecs[p], vecs[p])
                        - 2 * np.dot(v, vecs[p])), 9)
            for i, v in vecs.items()
            if i != p
        )
        d2s = [d for d in d2s if d > 0]
        slm += 0.5 * math.log(d2s[1] / d2s[0])
    assert out.n_probes == len(probes)
    assert out.n_vectors == len(vecs)
    assert abs(out.sum_ln_mu - slm) < 1e-4
    assert abs(out.intrinsic_dim - len(probes) / slm) < 1e-3
    assert 0 < out.intrinsic_dim < 64  # bounded by the ambient dim


def test_jsd_recompute(spark, sf_dir):
    out = textstats.jsd_source_vs_rest(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per = Counter()
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            per[(r.source, t)] += 1
    cf = Counter()
    for (s, t), c in per.items():
        cf[t] += c
    tot = sum(cf.values())
    src = out.source.iloc[0]
    tot_s = sum(c for (s, t), c in per.items() if s == src)
    jsd = 0.0
    for t, c in cf.items():
        cnt = per.get((src, t), 0)
        p = cnt / tot_s
        q = (c - cnt) / (tot - tot_s)
        m = (p + q) / 2
        if cnt > 0:
            jsd += p * math.log(p / m) / 2
        if c > cnt:
            jsd += q * math.log(q / m) / 2
    row = out[out.source == src].iloc[0]
    assert row.n_tokens == tot_s
    assert row.vocab_terms == len(cf)
    assert abs(row.jsd_nats - jsd) < 1e-6
    assert abs(row.jsd_distance - math.sqrt(jsd)) < 1e-6
    # JSD is bounded by ln 2
    assert (out.jsd_nats <= math.log(2) + 1e-9).all()
    assert (out.jsd_nats >= 0).all()
