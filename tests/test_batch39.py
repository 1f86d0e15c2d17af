"""Tests: round-4 session-13 batch 39 (polygon query, hard negatives,
centroid outliers, OOV rate, stickiness, range percolator) — independent
recomputes."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, similarity, textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _coords(doc_id: int) -> tuple[float, float]:
    lat = _md5_52(f"{doc_id}:lat") % 1800001 / 10000.0 - 90.0
    lon = _md5_52(f"{doc_id}:lon") % 3600001 / 10000.0 - 180.0
    return lat, lon


def _in_polygon(lon: float, lat: float) -> bool:
    poly = textstats.GEO_POLYGON
    n, inside = len(poly), False
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[(i + 1) % n]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def test_geo_polygon_recompute(spark, sf_dir):
    out = textstats.geo_polygon_query(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    exp = []
    for d in sorted(docs["doc_id"]):
        lat, lon = _coords(int(d))
        if _in_polygon(lon, lat):
            exp.append(int(d))
    assert out["doc_id"].tolist() == exp[:20]
    assert len(out) > 0
    for r in out.itertuples():
        lat, lon = _coords(int(r.doc_id))
        assert abs(r.lat - round(lat, 4)) < 1e-9
        assert _in_polygon(lon, lat)


def test_hard_negative_recompute(spark, sf_dir):
    out = similarity.hard_negative_mining(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, np.float64) for r in emb.itertuples()}
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    probes = [v for v in sorted(vecs) if v % similarity.HARDNEG_MOD == 0]
    assert probes
    for qid in probes:
        qv = vecs[qid]
        scored = []
        for vid, v in vecs.items():
            if vid == qid or labels[vid] == labels[qid]:
                continue
            c = float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv)))
            scored.append((round(c, 6), vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        sub = out[out["query_id"] == qid]
        assert sub["vec_id"].tolist() == [v for _, v in scored[: similarity.HARDNEG_K]]
        # every mined negative has a different label than the probe
        assert all(labels[int(v)] != labels[qid] for v in sub["vec_id"])


def test_centroid_outlier_recompute(spark, sf_dir):
    out = similarity.centroid_outlier_vecs(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    by_label = defaultdict(list)
    for r in emb.itertuples():
        by_label[int(r.label)].append(np.round(np.asarray(r.embedding, np.float64), 6))
    cents = {lb: np.stack(vs).sum(axis=0) / len(vs) for lb, vs in by_label.items()}
    dists = []
    for r in emb.itertuples():
        v = np.asarray(r.embedding, np.float64)
        c = cents[int(r.label)]
        dists.append((round(float(np.sqrt(((v - c) ** 2).sum())), 6), int(r.vec_id), int(r.label)))
    dists.sort(key=lambda t: (-t[0], t[1]))
    exp = dists[: similarity.CENTROID_OUTLIER_K]
    assert out["vec_id"].tolist() == [v for _, v, _ in exp]
    np.testing.assert_allclose(out["dist"], [d for d, _, _ in exp], atol=2e-6)


def test_oov_rate_recompute(spark, sf_dir):
    out = textstats.oov_rate_by_source(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df = Counter()
    per_source_tokens = defaultdict(list)
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        per_source_tokens[r.source].extend(toks)
        for t in set(toks):
            df[t] += 1
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {t for t, _ in ranked[: textstats.OOV_VOCAB_SIZE]}
    for r in out.itertuples():
        toks = per_source_tokens[r.source]
        oov = sum(1 for t in toks if t not in vocab)
        assert r.total_tokens == len(toks)
        assert r.oov_tokens == oov
        assert abs(r.oov_rate - round(oov / len(toks), 6)) < 1e-9
    assert set(out["source"]) == set(per_source_tokens)


def test_stickiness_recompute(spark, sf_dir):
    out = parity.stickiness_ratio(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(
        month=ev["ts"].dt.strftime("%Y-%m"), day=ev["ts"].dt.strftime("%Y-%m-%d")
    )
    got = {r.month: r for r in out.itertuples()}
    for month, g in ev.groupby("month"):
        mau = g["user_id"].nunique()
        dau = g.groupby("day")["user_id"].nunique()
        r = got[month]
        assert r.mau == mau
        assert r.n_days == len(dau)
        assert r.dau_sum == int(dau.sum())
        assert abs(r.stickiness - round((dau.sum() / len(dau)) / mau, 6)) < 1e-9
    assert len(out) == ev["month"].nunique()


def test_percolate_range_recompute(spark, sf_dir):
    out = fulltext.percolate_range_match(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    exp = []
    for qid, qtext, lo, hi in fulltext.PERCOLATE_RANGE_QUERIES:
        need = set(tokenize_string(qtext))
        for r in docs.itertuples():
            if lo <= r.n_chars < hi and need <= set(tokenize_string(r.text)):
                exp.append((qid, int(r.doc_id)))
    exp.sort()
    got = sorted(zip(out["query_id"], out["doc_id"].astype(int)))
    assert got == exp
    assert len(exp) > 0
