"""Tests: round-4 session-11 batch 23 (theta-sketch intersection,
geo_distance rings, CCNet perplexity buckets, Zipf fit, Flesch
reading ease) — independent pandas/numpy recomputes."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_kmv_intersection_recompute(spark, sf_dir):
    out = fulltext.kmv_intersection(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k = fulltext.KMV_K
    vocab = {
        lang: set().union(
            *(tokenize_string(t) for t in docs[docs["lang"] == lang]["text"])
        )
        for lang in (fulltext.KMV_LANG_A, fulltext.KMV_LANG_B)
    }
    sk = {
        lang: sorted(_md5_52(t) for t in v)[:k] for lang, v in vocab.items()
    }
    kth_a, kth_b = sk[fulltext.KMV_LANG_A][-1], sk[fulltext.KMV_LANG_B][-1]
    theta = min(kth_a, kth_b)
    n_match = len(
        {h for h in sk[fulltext.KMV_LANG_A] if h < theta}
        & {h for h in sk[fulltext.KMV_LANG_B] if h < theta}
    )
    n_exact = len(vocab[fulltext.KMV_LANG_A] & vocab[fulltext.KMV_LANG_B])
    row = out.iloc[0]
    assert (int(row.kth_a), int(row.kth_b), int(row.theta)) == (
        kth_a,
        kth_b,
        theta,
    )
    assert int(row.n_match) == n_match
    assert int(row.n_exact) == n_exact
    assert abs(row.est_intersection - round(n_match * 2**52 / theta, 6)) < 1e-6
    # the sketch estimate must be in the right ballpark of the exact overlap
    assert row.est_intersection == 0 or (
        0.2 < row.est_intersection / max(n_exact, 1) < 5.0
    )


def _coords(doc_id: int) -> tuple[float, float]:
    lat = _md5_52(f"{doc_id}:lat") % 1800001 / 10000.0 - 90.0
    lon = _md5_52(f"{doc_id}:lon") % 3600001 / 10000.0 - 180.0
    return lat, lon


def _havers(lat: float, lon: float, clat: float, clon: float) -> float:
    a = (
        math.sin(math.radians(lat - clat) / 2) ** 2
        + math.cos(math.radians(clat))
        * math.cos(math.radians(lat))
        * math.sin(math.radians(lon - clon) / 2) ** 2
    )
    return round(2.0 * 6371.0 * math.asin(math.sqrt(a)), 3)


def test_geo_distance_rings_recompute(spark, sf_dir):
    out = textstats.geo_distance_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    clat, clon = textstats.GEO_CENTER
    edges = textstats.GEO_RING_EDGES
    dists = [
        _havers(*_coords(int(d)), clat, clon) for d in docs["doc_id"]
    ]
    assert out["n_docs"].sum() == len(docs)
    for i, lo in enumerate(edges):
        hi = edges[i + 1] if i + 1 < len(edges) else float("inf")
        sel = [d for d in dists if lo <= d < hi]
        row = out[out["ring"] == i].iloc[0]
        assert int(row.n_docs) == len(sel)
        if sel:
            assert abs(row.mean_km - round(sum(sel) / len(sel), 6)) < 1e-6


def test_ccnet_buckets_partition_langs(spark, sf_dir):
    out = textstats.ccnet_perplexity_buckets(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per_lang = docs.groupby("lang").size()
    got = out.groupby("lang")["n_docs"].sum()
    for lang, n in per_lang.items():
        assert got[lang] == n
    # tercile monotonicity: head max <= middle min <= tail min per lang
    for lang, grp in out.groupby("lang"):
        g = grp.sort_values("bucket")
        assert (g["min_ce"] <= g["max_ce"]).all()
        assert list(g["max_ce"]) == sorted(g["max_ce"])
        # ntile balance: sizes differ by at most 1
        assert g["n_docs"].max() - g["n_docs"].min() <= 1


def test_zipf_fit_recompute(spark, sf_dir):
    out = textstats.zipf_fit(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    from collections import Counter

    cf = Counter()
    for t in docs["text"]:
        cf.update(tokenize_string(t))
    ranked = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.array(
        [round(math.log(i + 1), 6) for i in range(len(ranked))]
    )
    y = np.array([round(math.log(c), 6) for _, c in ranked])
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert int(out["n"].iloc[0]) == len(ranked)
    assert abs(out["slope"].iloc[0] - slope) < 1e-5
    assert abs(out["intercept"].iloc[0] - intercept) < 1e-5
    assert abs(out["r2"].iloc[0] - r * r) < 1e-5
    assert out["slope"].iloc[0] < 0  # frequencies fall with rank


def test_flesch_recompute(spark, sf_dir):
    out = (
        textstats.flesch_reading_ease(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    docs = _docs(sf_dir)
    for r in docs.head(50).itertuples():
        low = r.text.lower()
        w = len(tokenize_string(r.text))
        s = max(1, len(re.findall(r"[.!?]+", low)))
        syl = len(re.findall(r"[aeiouy]+", low))
        fre = round(206.835 - 1.015 * w / s - 84.6 * syl / w, 6)
        row = out.loc[int(r.doc_id)]
        assert (int(row.n_words), int(row.n_sentences), int(row.n_syllables)) == (
            w,
            s,
            syl,
        )
        assert abs(row.fre - fre) < 1e-9
