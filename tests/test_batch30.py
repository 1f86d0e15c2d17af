"""Tests: round-4 session-12 batch 30 (IB/Boolean similarities, chi-square
significant terms, cosine rescore, daily ACF, geo_bounds) — independent
pandas/numpy recomputes against the Spark outputs."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, similarity, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1

INV_LN2 = fulltext.DFR_INV_LN2


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _toks(docs: pd.DataFrame) -> dict[int, list[str]]:
    return {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}


def test_ib_topk_recompute(spark, sf_dir):
    out = fulltext.ib_topk(spark, sf_dir).toPandas()
    toks = _toks(_docs(sf_dir))
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    df = {q: sum(1 for t in toks.values() if q in t) for q in qts}
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:  # ascending term order, sequential
            tf = t.count(q)
            if not tf:
                continue
            tfn = tf * (math.log(1.0 + avgdl / len(t)) * INV_LN2)
            lam = (df[q] + 1.0) / (n + 1.0)
            s += math.log(1.0 + tfn / lam)
        if s:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))


def test_boolean_sim_topk_recompute(spark, sf_dir):
    out = fulltext.boolean_sim_topk(spark, sf_dir).toPandas()
    toks = _toks(_docs(sf_dir))
    qts = set(tokenize_string(fulltext.FLAGSHIP_QUERY))
    scores = {d: len(qts & set(t)) for d, t in toks.items()}
    scores = {d: s for d, s in scores.items() if s}
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"].astype(int)))
    assert got == want


def test_sig_terms_chi2_recompute(spark, sf_dir):
    out = fulltext.sig_terms_chi2(spark, sf_dir).toPandas()
    toks = _toks(_docs(sf_dir))
    qts = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = {d for d, t in toks.items() if qts & set(t)}
    n_fg, n_bg = len(hits), len(toks)
    fg, bg = {}, {}
    for d, t in toks.items():
        for term in set(t):
            bg[term] = bg.get(term, 0) + 1
            if d in hits:
                fg[term] = fg.get(term, 0) + 1
    rows = {}
    for term, a_i in fg.items():
        if term in qts or a_i < fulltext.SIGCHI2_MIN_DF:
            continue
        if a_i * n_bg <= bg[term] * n_fg:
            continue
        a = float(a_i)
        b = n_fg - a
        c = bg[term] - a
        d_ = (n_bg - n_fg) - c
        chi2 = n_bg * (a * d_ - b * c) ** 2 / ((a + b) * (c + d_) * (a + c) * (b + d_))
        rows[term] = round(chi2, 6)
    want = sorted(rows.items(), key=lambda kv: (-kv[1], kv[0]))[: fulltext.SIGCHI2_K]
    got = list(zip(out["term"], out["chi2"]))
    assert [t for t, _ in got] == [t for t, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))
    # every surfaced term must actually be fg-overrepresented
    for r in out.itertuples():
        assert r.df_fg * n_bg > r.df_bg * n_fg


def test_cosine_rescore_recompute(spark, sf_dir):
    out = similarity.cosine_rescore_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = _toks(docs)
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    df = {q: sum(1 for t in toks.values() if q in t) for q in qts}
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in qts:
            tf = t.count(q)
            if tf:
                idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
                s += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(t) / avgdl))
        if s:
            scores[d] = s  # UNROUNDED for the candidate cut
    cand = [
        d
        for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
            : similarity.RESCORE_DEPTH
        ]
    ]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    q = vecs[similarity.QUERY_VEC_ID]
    cos = {
        d: round(float(np.dot(vecs[d], q) / (np.linalg.norm(vecs[d]) * np.linalg.norm(q))), 6)
        for d in cand
    }
    want = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[: similarity.RESCORE_TOPK]
    got = list(zip(out["doc_id"].astype(int), out["cosine"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-6 for (_, a), (_, b) in zip(got, want))


def test_autocorrelation_daily_recompute(spark, sf_dir):
    out = parity.autocorrelation_daily(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].dt.normalize()
    counts = days.value_counts().sort_index()
    cal = pd.date_range(counts.index.min(), counts.index.max(), freq="D")
    x = counts.reindex(cal, fill_value=0).to_numpy(dtype=np.float64)
    m = x.mean()
    den = ((x - m) ** 2).sum()
    assert len(out) == parity.ACF_MAX_LAG
    for r in out.itertuples():
        lag = int(r.lag)
        num = ((x[:-lag] - m) * (x[lag:] - m)).sum()
        assert int(r.n_pairs) == len(x) - lag
        assert abs(r.acf - num / den) < 1e-6
    # lag-1 smoothness of a random-ish daily series stays in [-1, 1]
    assert out["acf"].abs().max() <= 1.0 + 1e-9


def test_geo_bounds_recompute(spark, sf_dir):
    out = textstats.geo_bounds_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)

    def md5_52(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    lat = [md5_52(f"{d}:lat") % 1800001 / 10000.0 - 90.0 for d in docs["doc_id"]]
    lon = [md5_52(f"{d}:lon") % 3600001 / 10000.0 - 180.0 for d in docs["doc_id"]]
    g = docs.assign(lat=lat, lon=lon).groupby("lang")
    want = g.agg(
        n=("doc_id", "size"), tl_lat=("lat", "max"), tl_lon=("lon", "min"),
        br_lat=("lat", "min"), br_lon=("lon", "max"),
    )
    assert list(out["lang"]) == sorted(want.index)
    for r in out.itertuples():
        w = want.loc[r.lang]
        assert int(r.n_docs) == int(w["n"])
        for got_v, want_v in [
            (r.top_left_lat, w["tl_lat"]), (r.top_left_lon, w["tl_lon"]),
            (r.bottom_right_lat, w["br_lat"]), (r.bottom_right_lon, w["br_lon"]),
        ]:
            assert abs(got_v - round(want_v, 6)) < 1e-9
