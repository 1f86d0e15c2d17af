"""Tests: round-4 session-12 batch 34 (vector PRF, session baskets, top
duplicated n-grams, simhash hamming histogram, chi-square independence) —
independent recomputes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, parity, similarity, textstats


def _emb(sf_dir: str):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in df.itertuples()}


def _cos(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (na ** 0.5 * nb ** 0.5)


def test_vector_prf_recompute(spark, sf_dir):
    out = similarity.vector_prf_topk(spark, sf_dir).toPandas()
    vecs = _emb(sf_dir)
    q = vecs[0]
    first = {v: round(_cos(vecs[v], q), 6) for v in vecs if v != 0}
    fb = [v for v, _ in sorted(first.items(), key=lambda kv: (-kv[1], kv[0]))[
        : similarity.VPRF_FEEDBACK_K
    ]]
    pool = fb + [0]
    qnew = np.array([
        float(sum(round(float(vecs[v][d]), 6) for v in pool)) / len(pool)
        for d in range(len(q))
    ])
    scores = {v: round(_cos(vecs[v], qnew), 6) for v in vecs if v != 0}
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
        : similarity.VPRF_TOPK
    ]
    got = list(zip(out["vec_id"].astype(int), out["cosine"]))
    assert [v for v, _ in got] == [v for v, _ in want]
    assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(got, want))
    # the feedback members must top the re-search (they define the center)
    assert set(fb) <= set(out["vec_id"].astype(int))


def test_session_event_pairs_recompute(spark, sf_dir):
    out = parity.session_event_pairs(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    gap_us = parity.SESSION_GAP_S * 1_000_000
    support = {}
    for _, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        types = list(g["event_type"])
        basket, last = set(), None
        baskets = []
        for t_us, t in zip(us, types):
            if last is not None and t_us - last >= gap_us:
                baskets.append(basket)
                basket = set()
            basket.add(t)
            last = t_us
        baskets.append(basket)
        for b in baskets:
            bs = sorted(b)
            for i, x in enumerate(bs):
                for y in bs[i + 1 :]:
                    support[(x, y)] = support.get((x, y), 0) + 1
    want = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[
        : parity.SESSION_PAIRS_K
    ]
    got = [((r.type_a, r.type_b), int(r.support)) for r in out.itertuples()]
    assert got == want


def test_top_duplicate_ngrams_recompute(spark, sf_dir):
    out = dedup.top_duplicate_ngrams(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = dedup.TOP_DUP_NGRAM_N
    df = {}
    for r in docs.itertuples():
        t = tokenize_string(r.text)
        for g in {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}:
            df[g] = df.get(g, 0) + 1
    dup = {g: c for g, c in df.items() if c >= 2}
    want = sorted(dup.items(), key=lambda kv: (-kv[1], kv[0]))[
        : dedup.TOP_DUP_NGRAM_K
    ]
    got = [(r.gram, int(r.df)) for r in out.itertuples()]
    assert got == want
    assert all(c >= 2 for _, c in got)


def test_simhash_hamming_histogram_consistency(spark, sf_dir):
    pairs = dedup.simhash_near_pairs(spark, sf_dir).toPandas()
    out = dedup.simhash_hamming_histogram(spark, sf_dir).toPandas()
    want = pairs["hamming"].value_counts().sort_index()
    assert list(out["hamming"]) == list(want.index)
    assert list(out["n_pairs"]) == list(want.values)
    assert out["n_pairs"].sum() == len(pairs)


def test_lang_source_independence_recompute(spark, sf_dir):
    out = textstats.lang_source_independence(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tab = docs.groupby(["source", "lang"]).size()
    rt = docs.groupby("source").size()
    ct = docs.groupby("lang").size()
    n = len(docs)
    chi2 = 0.0
    for (s, l), o in sorted(tab.items()):
        e = rt[s] * ct[l] / n
        chi2 += (o - e) ** 2 / e
    assert int(out.n_cells) == len(tab)
    assert int(out.dof) == (len(rt) - 1) * (len(ct) - 1)
    assert abs(out.chi2 - round(chi2, 6)) < 1e-6
    assert out.chi2 >= 0
