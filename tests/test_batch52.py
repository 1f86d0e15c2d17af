"""Tests: round-4 session-14 batch 52 — independent recomputes of
simple_query_string, MLT-unlike, BM25+, terms include/exclude, the
source overlap matrix, and the LSH band sweep."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, fulltext
from lucene_mapreduce_spark.query.bm25 import B, K1


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _bm25_scores(docs, terms):
    toks = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for t in sorted(set(terms)):
        df = sum(1 for ts in toks.values() if t in ts)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(t)
            if tf:
                sat = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * sat
    return scores, toks


def test_sqs_parser():
    groups, nots = fulltext.parse_simple_query_string(
        'slow | merge "fast scan" -dup'
    )
    assert groups == [
        [("term", "slow"), ("term", "merge")],
        [("phrase", ["fast", "scan"])],
    ]
    assert nots == ["dup"]


def test_simple_query_string_recompute(spark, sf_dir):
    out = fulltext.simple_query_string_query(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    groups, nots = fulltext.parse_simple_query_string(fulltext.SQS_QUERY)
    scoring = sorted(
        {t for g in groups for kind, t in g if kind == "term"}
    )
    scores, toks = _bm25_scores(docs, scoring)

    def has_phrase(ts, ph):
        return any(
            ts[i : i + len(ph)] == ph for i in range(len(ts) - len(ph) + 1)
        )

    cand = []
    for d, ts in toks.items():
        ok = all(
            any(
                (kind == "term" and v in ts)
                or (kind == "phrase" and has_phrase(ts, v))
                for kind, v in g
            )
            for g in groups
        ) and not any(t in ts for t in nots)
        if ok:
            cand.append(d)
    fused = [(d, round(scores.get(d, 0.0), 6)) for d in cand]
    fused.sort(key=lambda kv: (-kv[1], kv[0]))
    top = fused[:10]
    assert list(out["doc_id"]) == [d for d, _s in top]
    for got, (_d, s) in zip(out["score"], top):
        assert abs(got - s) < 1e-6


def test_mlt_unlike_vetoes_shared_terms(spark, sf_dir):
    out = fulltext.mlt_unlike_topk(spark, sf_dir).toPandas()
    base = fulltext.more_like_this_documents(spark, sf_dir).toPandas()
    assert len(out) == 10
    # the unlike veto must change the query (doc 17 shares vocabulary
    # with doc 42 in the synthetic corpus) — pages should differ
    assert list(out["doc_id"]) != list(base["doc_id"]) or list(
        out["score"]
    ) != list(base["score"])


def test_bm25plus_recompute(spark, sf_dir):
    out = fulltext.bm25plus_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    terms = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    toks = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for t in terms:
        df = sum(1 for ts in toks.values() if t in ts)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(t)
            if tf:
                sat = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * (
                    sat + fulltext.BM25PLUS_DELTA
                )
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[
        :10
    ]
    assert list(out["doc_id"]) == [d for d, _s in ranked]
    for got, (_d, s) in zip(out["score"], ranked):
        assert abs(got - round(s, 6)) < 1e-6
    # BM25+ page must dominate plain BM25 scores for the same docs
    plain, _ = _bm25_scores(docs, terms)
    for d, s in ranked:
        assert s > plain.get(d, 0.0)


def test_terms_include_exclude_recompute(spark, sf_dir):
    out = fulltext.terms_agg_include_exclude(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    pat = re.compile(fulltext.TERMS_INCLUDE)
    counts = {}
    for r in docs.itertuples():
        for t in set(tokenize_string(r.text)):
            if pat.search(t) and t not in fulltext.TERMS_EXCLUDE:
                counts[t] = counts.get(t, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(out["term"], out["doc_count"])) == ranked


def test_source_overlap_recompute(spark, sf_dir):
    out = dedup.source_overlap_matrix(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k = dedup.SHINGLE_K
    pairs = set()
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        for i in range(len(ts) - k + 1):
            pairs.add((" ".join(ts[i : i + k]), r.source))
    from collections import Counter, defaultdict

    per_shingle = Counter(s for s, _src in pairs)
    capped = [
        (s, src)
        for s, src in pairs
        if per_shingle[s] <= dedup.OVERLAP_MAX_SOURCES_PER_SHINGLE
    ]
    sizes = Counter(src for _s, src in capped)
    by_shingle = defaultdict(set)
    for s, src in capped:
        by_shingle[s].add(src)
    inter = Counter()
    for s, srcs in by_shingle.items():
        for a in srcs:
            for b in srcs:
                if a != b:
                    inter[(a, b)] += 1
    got = {(r.source_a, r.source_b): r for r in out.itertuples()}
    assert set(got) == set(inter)
    for key, n in inter.items():
        r = got[key]
        assert r.n_shared == n
        assert abs(r.containment - round(n / sizes[key[0]], 6)) < 1e-9


def test_lsh_band_sweep_recompute(spark, sf_dir):
    out = dedup.lsh_band_sweep(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k = dedup.SHINGLE_K
    sh = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        ss = {" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)}
        if ss:
            sh[r.doc_id] = ss
    sigs = {}
    for d, ss in sh.items():
        sigs[d] = [
            min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in ss)
            for i in range(dedup.N_MINHASH)
        ]
    got = out.set_index("bands")
    for bands, rows in dedup.LSH_SWEEP_CONFIGS:
        from collections import defaultdict

        buckets = defaultdict(list)
        for d, sg in sigs.items():
            for b in range(bands):
                key = (
                    b,
                    "|".join(
                        f"{i}:{sg[i]}" for i in range(b * rows, (b + 1) * rows)
                    ),
                )
                buckets[key].append(d)
        cands = set()
        for key, ds in buckets.items():
            if len(ds) > dedup.MAX_BUCKET:
                continue
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    cands.add((ds[i], ds[j]))
        ntrue = 0
        for a, b in cands:
            inter = len(sh[a] & sh[b])
            jac = inter / (len(sh[a]) + len(sh[b]) - inter)
            ntrue += jac >= dedup.LSH_SWEEP_TAU
        assert int(got.loc[bands, "n_candidates"]) == len(cands)
        assert int(got.loc[bands, "n_true"]) == ntrue
        if cands:
            assert (
                abs(
                    got.loc[bands, "precision"]
                    - round(ntrue / len(cands), 6)
                )
                < 1e-9
            )
    # (bands, rows) pairs with aligned nesting are supersets: a pair
    # agreeing on a 6-row band agrees on both contained 3-row bands
    # (bucket caps could in principle break this; they don't fire here)
    assert int(got.loc[2, "n_candidates"]) <= int(got.loc[4, "n_candidates"])
    assert int(got.loc[4, "n_candidates"]) <= int(got.loc[12, "n_candidates"])
