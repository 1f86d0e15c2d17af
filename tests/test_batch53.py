"""Tests: round-4 session-15 batch 53 — independent recomputes of
MultiPhraseQuery, FuzzySuggester, RM3 expansion terms, terms-agg
partition paging, and Dunning LLR collocations."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1


def _toks(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_multi_phrase_recompute(spark, sf_dir):
    out = fulltext.multi_phrase_query(spark, sf_dir).toPandas()
    first, alts = fulltext.MULTI_PHRASE
    want = sorted(
        d
        for d, ts in _toks(sf_dir).items()
        if any(
            ts[i] == first and ts[i + 1] in alts for i in range(len(ts) - 1)
        )
    )
    assert list(out["doc_id"]) == want
    # the synonym slot must strictly widen the single phrase
    single = sorted(
        d
        for d, ts in _toks(sf_dir).items()
        if any(
            ts[i] == first and ts[i + 1] == alts[0]
            for i in range(len(ts) - 1)
        )
    )
    assert set(single) <= set(want)


def test_fuzzy_autocomplete_recompute(spark, sf_dir):
    out = fulltext.fuzzy_autocomplete(spark, sf_dir).toPandas()
    prefix = fulltext.FUZZY_SUGGEST_INPUT
    cf: dict[str, int] = {}
    for ts in _toks(sf_dir).values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    cands = [
        (t, _lev(t[: len(prefix)], prefix), c)
        for t, c in cf.items()
        if _lev(t[: len(prefix)], prefix) <= 1
    ]
    cands.sort(key=lambda x: (-x[2], x[0]))
    top = cands[:5]
    assert list(out["term"]) == [t for t, _d, _c in top]
    assert list(out["cf"]) == [c for _t, _d, c in top]
    assert list(out["dist"]) == [d for _t, d, _c in top]


def test_rm3_expansion_recompute(spark, sf_dir):
    out = fulltext.rm3_expansion_terms(spark, sf_dir).toPandas()
    toks = _toks(sf_dir)
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores: dict[int, float] = {}
    for t in qts:
        df = sum(1 for ts in toks.values() if t in ts)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(t)
            if tf:
                sat = tf * (K1 + 1.0) / (
                    tf + K1 * (1 - B + B * len(ts) / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + idf * sat
    page = sorted(
        ((d, round(s, 6)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[: fulltext.PRF_FEEDBACK_K]
    rm: dict[str, float] = {}
    for r, (d, _s) in enumerate(page, 1):
        ts = toks[d]
        dl = float(len(ts))
        for t in set(ts):
            if t in qts:
                continue
            rm[t] = rm.get(t, 0.0) + round((ts.count(t) / dl) / r, 12)
    ranked = sorted(
        ((t, round(s, 6)) for t, s in rm.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[: fulltext.RM3_EXPANSION_K]
    assert list(out["term"]) == [t for t, _s in ranked]
    for got, (_t, s) in zip(out["rm_score"], ranked):
        assert abs(got - s) < 1e-6
    assert not set(out["term"]) & set(qts)


def test_terms_partition_covers_vocab(spark, sf_dir):
    """Union of the num_partitions pages == unpartitioned vocabulary,
    pages are disjoint, and page 0 matches a direct recompute."""
    nparts = fulltext.TERMS_NUM_PARTITIONS
    toks = _toks(sf_dir)
    dfc: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            dfc[t] = dfc.get(t, 0) + 1
    pages = [
        fulltext.terms_partition_agg(spark, sf_dir, partition=p, k=10**6)
        .toPandas()
        for p in range(nparts)
    ]
    seen: set[str] = set()
    for p, page in enumerate(pages):
        terms = set(page["term"])
        assert not terms & seen
        seen |= terms
        for t in terms:
            assert _md5_52(t) % nparts == p
    assert seen == set(dfc)
    page0 = sorted(
        ((t, c) for t, c in dfc.items() if _md5_52(t) % nparts == 0),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert list(pages[0]["term"]) == [t for t, _c in page0]
    assert list(pages[0]["doc_count"]) == [c for _t, c in page0]


def test_bigram_llr_recompute(spark, sf_dir):
    out = textstats.bigram_llr_collocations(spark, sf_dir).toPandas()
    ab: dict[tuple[str, str], int] = {}
    for ts in _toks(sf_dir).values():
        for i in range(len(ts) - 1):
            ab[(ts[i], ts[i + 1])] = ab.get((ts[i], ts[i + 1]), 0) + 1
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for (a, b), c in ab.items():
        ca[a] = ca.get(a, 0) + c
        cb[b] = cb.get(b, 0) + c
    n = sum(ab.values())

    def cell(k, row, col):
        return float(k) * math.log((float(k) * float(n)) / (float(row) * float(col))) if k > 0 else 0.0

    rows = []
    for (a, b), k in ab.items():
        if k < textstats.LLR_MIN_PAIR:
            continue
        llr = 2.0 * (
            (
                (cell(k, ca[a], cb[b]) + cell(ca[a] - k, ca[a], n - cb[b]))
                + cell(cb[b] - k, n - ca[a], cb[b])
            )
            + cell(n - ca[a] - cb[b] + k, n - ca[a], n - cb[b])
        )
        rows.append((a, b, k, round(llr, 6)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    top = rows[: textstats.LLR_TOPK]
    assert [tuple(r) for r in out[["term_a", "term_b", "n_ab"]].itertuples(index=False)] == [
        (a, b, k) for a, b, k, _l in top
    ]
    for got, (_a, _b, _k, l) in zip(out["llr"], top):
        assert abs(got - l) < 1e-6
    # G² is non-negative by construction
    assert (out["llr"] >= -1e-9).all()
