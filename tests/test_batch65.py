"""Tests: round-4 session-14 batch 65 — dup-method agreement, BPE merge
gain, BM25 parameter sweep."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, fulltext, textstats


def test_dup_method_agreement_consistent(spark, sf_dir):
    out = dedup.dup_method_agreement(spark, sf_dir).toPandas().iloc[0]
    a = dedup.minhash_lsh_pairs(spark, sf_dir).toPandas()
    b = dedup.simhash_near_pairs(spark, sf_dir).toPandas()
    pa = set(zip(a.doc_a, a.doc_b))
    pb = set(zip(b.doc_a, b.doc_b))
    assert out.n_minhash == len(pa)
    assert out.n_simhash == len(pb)
    assert out.n_both == len(pa & pb)
    union = len(pa | pb)
    assert abs(out.jaccard - round(len(pa & pb) / union, 6)) < 1e-9
    # the planted near-dups should be visible to both methods
    assert out.n_both > 0


def test_bpe_merge_gain_recompute(spark, sf_dir):
    out = textstats.bpe_merge_gain(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    freq: dict[str, int] = {}
    for text in docs.text:
        for w in tokenize_string(text):
            freq[w] = freq.get(w, 0) + 1
    pairs: dict[str, int] = {}
    for w, f in freq.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] = pairs.get(w[i : i + 2], 0) + f
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    assert out.pair == top
    merges = sum(
        f * ((len(w) - len(w.replace(top, ""))) // 2) for w, f in freq.items()
    )
    before = sum(f * len(w) for w, f in freq.items())
    assert out.n_merges == merges
    assert out.symbols_before == before
    assert out.symbols_after == before - merges
    assert abs(out.compression - round((before - merges) / before, 6)) < 1e-9
    assert merges > 0


def test_bm25_sweep_overlap_bounds(spark, sf_dir):
    out = fulltext.bm25_param_sweep_overlap(spark, sf_dir).toPandas()
    assert len(out) == len(fulltext.BM25_SWEEP_COMBOS)
    assert ((out.n_common >= 0) & (out.n_common <= 10)).all()
    # recompute one leg directly through the tuned scorer
    k1, b = fulltext.BM25_SWEEP_COMBOS[0]
    dflt = fulltext.bm25_tuned_topk(spark, sf_dir).toPandas()  # default args
    from lucene_mapreduce_spark.query.bm25 import B, K1

    base = fulltext.bm25_tuned_topk(spark, sf_dir, k1=K1, b=B).toPandas()
    leg = fulltext.bm25_tuned_topk(spark, sf_dir, k1=k1, b=b).toPandas()
    want = len(set(leg.doc_id) & set(base.doc_id))
    got = out[(out.k1 == k1) & (out.b == b)].n_common.iloc[0]
    assert got == want
    assert dflt is not None
