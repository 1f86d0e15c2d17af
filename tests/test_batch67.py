"""Tests: round-4 session-14 batch 67 — nprobe recall curve, LSH + tf-idf
cosine rescore."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, similarity


def test_nprobe_recall_curve_monotone_and_consistent(spark, sf_dir):
    out = similarity.ivf_nprobe_recall_curve(spark, sf_dir).toPandas()
    assert list(out.nprobe) == list(similarity.NPROBE_CURVE)
    # recall can only improve as more lists are probed
    assert list(out.recall) == sorted(out.recall)
    assert ((out.recall >= 0) & (out.recall <= 1)).all()
    # the default-nprobe point must agree with ann_recall_at_k's totals
    per_q = similarity.ann_recall_at_k(spark, sf_dir).toPandas()
    default_row = out[out.nprobe == 4].iloc[0]
    assert default_row.total_hits == per_q.n_hits.sum()
    assert default_row.n_queries == len(per_q)


def test_lsh_tfidf_rescore_recompute(spark, sf_dir):
    out = dedup.lsh_tfidf_cosine_rescore(spark, sf_dir).toPandas()
    cand = dedup.minhash_lsh_pairs(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tfs = {}
    for r in docs.itertuples():
        d: dict[str, int] = {}
        for t in tokenize_string(r.text):
            d[t] = d.get(t, 0) + 1
        tfs[r.doc_id] = d
    n = len(docs)
    df: dict[str, int] = {}
    for d in tfs.values():
        for t in d:
            df[t] = df.get(t, 0) + 1

    def wvec(doc):
        return {
            t: tf * (1.0 + math.log(n / (df[t] + 1.0)))
            for t, tf in tfs[doc].items()
        }

    def norm(v):
        return math.sqrt(sum(round(x * x, 12) for x in v.values()))

    scored = []
    for a, b in zip(cand.doc_a, cand.doc_b):
        va, vb = wvec(a), wvec(b)
        dot = sum(round(va[t] * vb[t], 12) for t in va if t in vb)
        scored.append((round(dot / (norm(va) * norm(vb)), 6), a, b))
    want = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[
        : dedup.TFIDF_RESCORE_TOP_K
    ]
    assert [(r.doc_a, r.doc_b) for r in out.itertuples(index=False)] == [
        (a, b) for _, a, b in want
    ]
    for r, (c, _a, _b) in zip(out.itertuples(index=False), want):
        assert abs(r.cosine - c) < 1e-6
    # near-dup candidates should score high lexical cosine
    assert out.cosine.iloc[0] > 0.8
