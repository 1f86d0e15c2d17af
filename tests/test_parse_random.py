"""Seeded randomized identity: search_parsed vs an independent brute-force
evaluator of the same clause spec (shared only the tokenizer + parse)."""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.query.bm25 import B, K1, bm25_idf
from lucene_mapreduce_spark.query.parse import parse_query
from lucene_mapreduce_spark.query.wand import IndexSearcher

VOCAB = [f"w{i}" for i in range(30)]


def _ref_parsed(texts: dict[int, str], query: str, k: int = 10):
    """Brute-force reference: same candidate semantics, same canonical
    ascending-term float accumulation, corpus-global stats."""
    must, nots, phrases, should = parse_query(query)
    toks = {d: tokenize_string(t) for d, t in texts.items()}

    def has_phrase(ts, ph):
        n = len(ph)
        return any(ts[i: i + n] == ph for i in range(len(ts) - n + 1))

    cand = None
    if must:
        cand = {d for d, ts in toks.items() if all(w in ts for w in must)}
    for ph in phrases:
        hit = {d for d, ts in toks.items() if has_phrase(ts, ph)}
        cand = hit if cand is None else cand & hit
    scoring = sorted(set(must) | set(should))
    if cand is None:
        if not scoring:
            return []
        cand = {d for d, ts in toks.items() if any(w in ts for w in scoring)}
    if nots:
        cand -= {d for d, ts in toks.items() if any(w in ts for w in nots)}
    if not cand:
        return []
    n_docs = len(toks)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n_docs
    scores = {d: 0.0 for d in cand}
    for t in scoring:
        df_t = sum(1 for ts in toks.values() if t in ts)
        if df_t == 0:
            continue
        idf = bm25_idf(df_t, n_docs)
        for d in sorted(cand):
            tf = float(toks[d].count(t))
            if tf:
                scores[d] += (
                    idf
                    * (tf * (K1 + 1.0))
                    / (tf + K1 * (1.0 - B + B * dl[d] / avgdl))
                )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s) for d, s in ranked]


@pytest.mark.parametrize("seed", [7, 19, 101])
def test_search_parsed_randomized_identity(spark, tmp_path_factory, seed):
    rng = random.Random(seed)
    texts = {
        d: " ".join(rng.choices(VOCAB, k=rng.randint(3, 25)))
        for d in range(120)
    }
    sf = str(tmp_path_factory.mktemp(f"pr{seed}"))
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}).to_parquet(
        os.path.join(sf, "documents.parquet")
    )
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    ix = sf + "/ix"
    build_segment(spark, corpus, ix, num_partitions=4, store_fields=True)
    s = IndexSearcher(ix)

    for _ in range(25):
        parts = []
        for w in rng.sample(VOCAB, rng.randint(1, 5)):
            parts.append(rng.choice(["", "", "+", "-"]) + w)
        if rng.random() < 0.5:
            a, b = rng.sample(VOCAB, 2)
            parts.append(f'"{a} {b}"')
        query = " ".join(parts)
        got = s.search_parsed(query, k=10)
        want = _ref_parsed(texts, query, k=10)
        assert got == want, f"seed={seed} query={query!r}"


@pytest.mark.parametrize("seed", [13, 47])
def test_search_parsed_ext_degenerates_randomized(spark, tmp_path_factory, seed):
    """Without boosts/fields/min_should_match, search_parsed_ext must be
    float-identical to search_parsed on random queries; a ^1 boost is an
    exact no-op (1.0 * x == x in IEEE)."""
    rng = random.Random(seed)
    texts = {
        d: " ".join(rng.choices(VOCAB, k=rng.randint(3, 20)))
        for d in range(80)
    }
    sf = str(tmp_path_factory.mktemp(f"px{seed}"))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    ix = sf + "/ix"
    build_segment(spark, corpus, ix, num_partitions=4, store_fields=True)
    s = IndexSearcher(ix)
    for _ in range(20):
        parts = []
        for w in rng.sample(VOCAB, rng.randint(1, 5)):
            parts.append(rng.choice(["", "", "+", "-"]) + w)
        if rng.random() < 0.4:
            a, b = rng.sample(VOCAB, 2)
            parts.append(f'"{a} {b}"')
        query = " ".join(parts)
        assert s.search_parsed_ext(query, k=10) == s.search_parsed(query, k=10), query
        boosted1 = " ".join(
            p + "^1" if p and p[0] not in "+-\"" and rng.random() < 0.5 else p
            for p in parts
        )
        assert s.search_parsed_ext(boosted1, k=10) == s.search_parsed(query, k=10), (
            boosted1
        )


@pytest.mark.parametrize("seed", [23, 61])
def test_phrase_near_positions_vs_stored_randomized(
    spark, tmp_path_factory, seed
):
    """Random corpora + random phrases/windows: the positional and
    stored-field verification paths must return identical doc sets, and
    the distributed batch paths must match the serving path."""
    from lucene_mapreduce_spark.query.segments import near_match, phrase_match

    rng = random.Random(seed)
    small_vocab = VOCAB[:8]  # dense: phrases actually occur
    texts = {
        d: " ".join(rng.choices(small_vocab, k=rng.randint(2, 15)))
        for d in range(60)
    }
    sf = str(tmp_path_factory.mktemp(f"pp{seed}"))
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    ix = sf + "/ix"
    build_segment(
        spark, corpus, ix, num_partitions=4, store_fields=True,
        with_positions=True,
    )
    s = IndexSearcher(ix)
    for _ in range(10):
        ph = " ".join(rng.choices(small_vocab, k=rng.randint(2, 3)))
        a = list(s.search_phrase(ph, use="positions"))
        b = list(s.search_phrase(ph, use="stored"))
        assert a == b, f"phrase {ph!r}"
        c = [r["doc_id"] for r in phrase_match(spark, ix, ph).collect()]
        assert c == a, f"batch phrase {ph!r}"
        w = rng.randint(2, 5)
        na = list(s.search_near(ph, window=w, use="positions"))
        nb = list(s.search_near(ph, window=w, use="stored"))
        assert na == nb, f"near {ph!r} w={w}"
        nc = [r["doc_id"] for r in near_match(spark, ix, ph, window=w).collect()]
        assert nc == na, f"batch near {ph!r} w={w}"
        slop = rng.randint(0, 3)
        sa = list(s.search_phrase_slop(ph, slop, use="positions"))
        sb = list(s.search_phrase_slop(ph, slop, use="stored"))
        assert sa == sb, f"slop {ph!r} ~{slop}"
        if slop == 0:
            assert sa == list(s.search_phrase(ph, use="positions"))
