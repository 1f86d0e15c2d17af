"""Tests: round-4 session-13 batch 41 (rank_feature log/sigmoid, PIT
search_after, vocab coverage, front-coding, peak concurrency) — independent
recomputes."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def test_rank_feature_variants(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    nchars = dict(zip(docs["doc_id"].astype(int), docs["n_chars"].astype(int)))
    for fn, (pivot, weight), boost in (
        (
            fulltext.rank_feature_log_query,
            fulltext.RANK_FEATURE_LOG,
            lambda x, p, w: w * math.log(1.0 + x / p),
        ),
        (
            fulltext.rank_feature_sigmoid_query,
            fulltext.RANK_FEATURE_SIGMOID,
            lambda x, p, w: w * (x * x) / (x * x + p * p),
        ),
    ):
        out = fn(spark, sf_dir).toPandas()
        assert len(out) == 10
        # the boost component is recoverable: score - boost must equal the
        # plain BM25 score for that doc (cross-checked against bm25_topk's
        # exact scorer on overlapping docs)
        bm = {
            int(r.doc_id): float(r.score)
            for r in fulltext.bm25_topk_documents(spark, sf_dir, k=200).collect()
        }
        for r in out.itertuples():
            d = int(r.doc_id)
            if d in bm:
                expect = round(bm[d] + boost(nchars[d], pivot, weight), 6)
                # bm25_topk rounds its score; allow the double round drift
                assert abs(r.score - expect) < 2e-6


def test_pit_search_after_consistency(spark, sf_dir):
    page1 = fulltext.search_at_generation(spark, sf_dir, k=10).toPandas()
    page2 = fulltext.pit_search_after_page(spark, sf_dir).toPandas()
    assert page2["rank"].tolist() == list(range(11, 11 + len(page2)))
    # pages never overlap and scores never increase across the boundary
    assert not set(page1["doc_id"]) & set(page2["doc_id"])
    if len(page2):
        assert page2["score"].iloc[0] <= page1["score"].iloc[-1] + 1e-9


def test_vocab_coverage_recompute(spark, sf_dir):
    out = textstats.vocab_coverage_curve(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts = Counter()
    for r in docs.itertuples():
        counts.update(tokenize_string(r.text))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    assert len(out) == len(textstats.VOCAB_COVERAGE_PCTS)
    for r in out.itertuples():
        num = int(round(r.pct * 100))
        cum = 0
        for k, (_t, n) in enumerate(ranked, start=1):
            cum += n
            if cum * 100 >= total * num:
                break
        assert r.k_terms == k
        assert r.tokens_covered == cum
        assert r.total == total
    # monotone: higher coverage needs at least as many terms
    assert out["k_terms"].tolist() == sorted(out["k_terms"])


def test_frontcoding_recompute(spark, sf_dir):
    out = textstats.term_dict_frontcoding_report(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = sorted({t for r in docs.itertuples() for t in tokenize_string(r.text)})
    saved = 0
    for prev, term in zip([None] + vocab[:-1], vocab):
        if prev is None:
            continue
        i = 0
        while i < min(len(prev), len(term)) and prev[i] == term[i]:
            i += 1
        saved += i
    raw = sum(len(t) for t in vocab)
    assert int(out.n_terms) == len(vocab)
    assert int(out.raw_bytes) == raw
    assert int(out.saved_bytes) == saved
    assert abs(out.savings_ratio - round(saved / raw, 6)) < 1e-9


def test_peak_concurrent_recompute(spark, sf_dir):
    out = parity.peak_concurrent_sessions(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us).sort_values(["user_id", "us", "event_id"])
    sessions = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for t in g["us"]:
            if prev is None or t - prev >= parity.SESSION_GAP_S * 1_000_000:
                if start is not None:
                    sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    bounds = sorted(
        [(s, 1) for s, _ in sessions] + [(e, -1) for _, e in sessions]
    )
    run = peak = 0
    peak_at = None
    for t, d in bounds:
        run += d
        if run > peak:
            peak, peak_at = run, t
    assert int(out.n_sessions) == len(sessions)
    assert int(out.peak_concurrent) == peak
    assert int(out.peak_at_us) == peak_at
