"""Tests: round-3 session-7 batch 11 (tf-idf keywords / BPE pair counts /
geohash grid / ip_range / stemmed terms) — invariants beyond the DuckDB
oracle gate."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_tfidf_keywords_match_manual(spark, sf_dir):
    out = textstats.tfidf_keywords(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = {d: tokenize_string(t) for d, t in zip(docs["doc_id"], docs["text"])}
    df = Counter(t for ts in toks.values() for t in set(ts))
    n = float(len(docs))
    k = textstats.TFIDF_KEYWORDS_K
    for doc_id, grp in out.groupby("doc_id"):
        tf = Counter(toks[doc_id])
        scored = sorted(
            ((round(c * math.log(n / df[t]), 6), t) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        got = list(zip(grp.sort_values("krank")["tfidf"], grp.sort_values("krank")["term"]))
        for (gs, gt), (ws, wt) in zip(got, scored):
            assert gt == wt and math.isclose(gs, ws, abs_tol=1e-9)
        assert list(grp["krank"]) == list(range(1, len(scored) + 1))


def test_bpe_pairs_weighted_by_corpus_frequency(spark, sf_dir):
    out = textstats.bpe_pair_counts(spark, sf_dir).toPandas()
    words = Counter(
        w for t in _docs(sf_dir)["text"] for w in tokenize_string(t)
    )
    pairs: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += f
    exp = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.BPE_PAIRS_K
    ]
    got = list(zip(out["pair"], out["count"]))
    assert got == exp


def test_geohash_grid_covers_and_decodes(spark, sf_dir):
    out = textstats.geohash_grid_agg(spark, sf_dir, k=10_000).toPandas()
    docs = _docs(sf_dir)
    assert out["n_docs"].sum() == len(docs)
    alpha = textstats._GEOHASH32
    # recompute geohashes by hand for the whole corpus
    def md5_52(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    exp: Counter = Counter()
    for d in docs["doc_id"]:
        lat = (md5_52(f"{int(d)}:lat") % 1800001) / 10000.0 - 90.0
        lon = (md5_52(f"{int(d)}:lon") % 3600001) / 10000.0 - 180.0
        lon_idx = min(255, math.floor((lon + 180.0) / 360.0 * 256.0))
        lat_idx = min(127, math.floor((lat + 90.0) / 180.0 * 128.0))
        v = 0
        for j in range(8):
            v += ((lon_idx >> (7 - j)) & 1) << (14 - 2 * j)
        for j in range(7):
            v += ((lat_idx >> (6 - j)) & 1) << (13 - 2 * j)
        exp[alpha[(v >> 10) & 31] + alpha[(v >> 5) & 31] + alpha[v & 31]] += 1
    assert dict(zip(out["geohash"], out["n_docs"])) == dict(exp)


def test_ip_range_buckets_partition_events(spark, sf_dir):
    out = textstats.ip_range_agg(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert out["n_events"].sum() == len(ev)  # ranges are exhaustive
    assert set(out["key"]) == {k for _, _, k in textstats.IP_RANGES}


def test_stemmed_terms_collapse_variants(spark, sf_dir):
    out = textstats.stemmed_terms_agg(spark, sf_dir, k=100_000).toPandas()
    words = [
        w for t in _docs(sf_dir)["text"] for w in tokenize_string(t)
    ]

    def stem(w: str) -> str:
        if len(w) > 5 and w.endswith("ing"):
            return w[:-3]
        if len(w) > 4 and (w.endswith("ed") or w.endswith("es")):
            return w[:-2]
        if len(w) > 3 and w.endswith("s") and not w.endswith("ss"):
            return w[:-1]
        return w

    exp = Counter(stem(w) for w in words)
    assert out["cf"].sum() == len(words)
    assert dict(zip(out["stem"], out["cf"])) == dict(exp)
