"""Tests: round-4 session-18 batch 166 — pivoted norm, LFU curve."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext


def test_pivoted_norm_recompute(spark, sf_dir):
    out = fulltext.pivoted_norm_topk(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.text.map(tokenize_string)
    dls = toks.map(len)
    n_docs, avgdl = len(docs), dls.sum() / len(docs)
    qterms = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    dfs = {t: sum(1 for tk in toks if t in tk) for t in qterms}
    s = fulltext.PIVOT_S
    rows = []
    for doc_id, tk, dl in zip(docs.doc_id, toks, dls):
        c = Counter(tk)
        score = 0.0
        for t in qterms:  # ascending-term accumulation
            tf = c[t]
            if tf:
                score += (
                    (1 + math.log(1 + math.log(tf)))
                    / ((1 - s) + s * dl / avgdl)
                    * math.log((n_docs + 1) / dfs[t])
                )
        if score > 0:
            rows.append((doc_id, round(score, 6)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    for i, row in enumerate(out.itertuples()):
        assert row.doc_id == rows[i][0]
        assert abs(row.score - rows[i][1]) < 1e-6
        assert row.rank == i + 1


def test_lfu_curve_recompute(spark, sf_dir):
    out = fulltext.lfu_cache_hit_curve(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = Counter()
    for txt in docs.text:
        cf.update(tokenize_string(txt))
    total = sum(cf.values())
    ordered = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
    prev = 0.0
    for row in out.itertuples():
        c = min(row.cache_size, len(ordered))
        hit = sum(v for _, v in ordered[:c]) / total
        assert row.terms_cached == c
        assert abs(row.hit_rate - hit) < 1e-6
        assert abs(row.marginal_gain - (round(hit, 6) - prev)) < 1e-6
        prev = round(hit, 6)
    # (no concavity assert: the closed 31-token vocab is near-uniform, so
    # the 16->32 doubling adds ~15 terms of mass vs 8->16's 8)
    assert out.hit_rate.is_monotonic_increasing
    assert out.hit_rate.iloc[-1] <= 1.0 + 1e-9
