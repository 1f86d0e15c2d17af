"""Tests: round-4 session-11 batch 22 (DFI / Axiomatic similarities,
bigram LM cross-entropy, OLS sufficient-statistics fit, winnowing
fingerprints) — independent pandas/numpy recomputes beyond the DuckDB
oracle gate."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, fulltext, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _tok_map(docs: pd.DataFrame) -> dict[int, list[str]]:
    return {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}


def test_dfi_scores_recompute(spark, sf_dir):
    out = fulltext.dfi_topk(spark, sf_dir).toPandas()
    toks = _tok_map(_docs(sf_dir))
    total = float(sum(len(t) for t in toks.values()))
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    cf = {q: float(sum(t.count(q) for t in toks.values())) for q in qts}
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:  # ascending-term sequential accumulation
            tf = float(t.count(q))
            if not tf:
                continue
            expected = (cf[q] + 1.0) * len(t) / (total + 1.0)
            if tf <= expected:
                continue
            s += (
                math.log(1.0 + (tf - expected) ** 2 / expected)
                * fulltext.DFR_INV_LN2
            )
        if round(s, 6) > 0.0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))


def test_axiomatic_scores_recompute(spark, sf_dir):
    out = fulltext.axiomatic_topk(spark, sf_dir).toPandas()
    toks = _tok_map(_docs(sf_dir))
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    df = {q: float(sum(1 for t in toks.values() if q in t)) for q in qts}
    s_p = fulltext.AXIOMATIC_S
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:
            tf = float(t.count(q))
            if not tf or not df[q]:
                continue
            tfln = tf / (tf + s_p + s_p * len(t) / avgdl)
            s += tfln * math.sqrt((n + 1.0) / df[q])
        if s > 0.0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))


def test_bigram_logprob_recompute(spark, sf_dir):
    out = (
        textstats.bigram_logprob(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    toks = _tok_map(_docs(sf_dir))
    from collections import Counter

    c_uv: Counter = Counter()
    c_u: Counter = Counter()
    for t in toks.values():
        c_u.update(t)
        c_uv.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    v = len(c_u)
    for d, t in toks.items():
        if len(t) < 2:
            assert d not in out.index
            continue
        grams = Counter(f"{a} {b}" for a, b in zip(t, t[1:]))
        s = 0.0
        for g in sorted(grams):  # ascending-bigram sequential fold
            u = g.split(" ")[0]
            s += grams[g] * math.log((c_uv[g] + 1.0) / (c_u[u] + v))
        want = round(-s / sum(grams.values()), 6)
        assert int(out.loc[d, "n_bigrams"]) == sum(grams.values())
        assert abs(out.loc[d, "cross_entropy"] - want) < 1e-9


def test_ols_fit_recompute(spark, sf_dir):
    out = textstats.ols_token_chars_fit(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    x = docs["n_chars"].to_numpy(float)
    y = np.array([len(tokenize_string(t)) for t in docs["text"]], float)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert int(out["n"].iloc[0]) == len(docs)
    assert abs(out["slope"].iloc[0] - slope) < 1e-6
    assert abs(out["intercept"].iloc[0] - intercept) < 1e-6
    assert abs(out["r2"].iloc[0] - r * r) < 1e-6
    # chars->tokens must be a strong positive fit on this corpus
    assert out["slope"].iloc[0] > 0 and out["r2"].iloc[0] > 0.9


def _winnow(text: str) -> set[str]:
    body = text[: dedup.WINNOW_CAP]
    k, w = dedup.WINNOW_K, dedup.WINNOW_W
    if len(body) < k + w - 1:
        return set()
    h = [
        hashlib.md5(body[i : i + k].encode()).hexdigest()
        for i in range(len(body) - k + 1)
    ]
    return {min(h[j : j + w]) for j in range(len(h) - w + 1)}


def test_winnowing_recompute(spark, sf_dir):
    out = dedup.winnowing_dup_candidates(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    from collections import defaultdict

    owners: dict[str, list[int]] = defaultdict(list)
    for r in docs.itertuples():
        for fp in _winnow(r.text):
            owners[fp].append(int(r.doc_id))
    hot = [
        (fp, len(ds), min(ds)) for fp, ds in owners.items() if len(ds) >= 2
    ]
    hot.sort(key=lambda t: (-t[1], t[0]))
    want = hot[: dedup.WINNOW_TOPN]
    got = list(
        zip(out["fp"], out["n_docs"].astype(int), out["witness_doc_id"].astype(int))
    )
    assert got == want
    assert len(got) > 0  # the corpus plants near-dups; they must surface


def test_winnowing_shared_substring_guarantee(spark, sf_dir):
    # two docs sharing a >= k+w-1 char prefix window must share a fingerprint
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over a sleeping cat in the garden"
    fa, fb = _winnow(a), _winnow(b)
    assert fa & fb
