"""Tests: round-4 session-16 batch 81 — embedding drift halves,
centered anisotropy audit, grid-DBSCAN core cells."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import similarity, textstats


def test_embedding_drift_recompute(spark, sf_dir):
    out = similarity.embedding_drift_halves(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n = len(emb)
    emb["half"] = (emb.vec_id * 2 < n).astype(int)
    assert len(out) == emb.label.nunique()
    for r in out.itertuples():
        g = emb[emb.label == r.label]
        a = np.stack(g[g.half == 1].embedding.values).astype(np.float64)
        b = np.stack(g[g.half == 0].embedding.values).astype(np.float64)
        assert r.n_a == len(a) and r.n_b == len(b)
        ma, mb = a.mean(axis=0), b.mean(axis=0)
        cos = float(
            ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb))
        )
        assert abs(r.centroid_cosine - cos) < 1e-5


def test_centered_anisotropy_recompute(spark, sf_dir):
    out = similarity.centered_anisotropy_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.stack(emb.embedding.values).astype(np.float64)

    def mpc(mat):
        norms = np.linalg.norm(mat, axis=1)
        u = mat[norms > 0] / norms[norms > 0, None]
        n = len(u)
        sq = float(np.sum(u.sum(axis=0) ** 2))
        return (sq - n) / (n * (n - 1)), n

    raw, n_raw = mpc(v)
    cent, n_cent = mpc(v - v.mean(axis=0))
    assert r.n_raw == n_raw and r.n_centered == n_cent
    assert abs(r.raw_mean_cosine - raw) < 1e-5
    assert abs(r.centered_mean_cosine - cent) < 1e-5
    # centering can only remove the common direction, never add one:
    # |centered mean cosine| should not exceed |raw| by much
    assert abs(r.centered_mean_cosine) < abs(r.raw_mean_cosine) + 0.01


def test_dbscan_cores_recompute(spark, sf_dir):
    out = textstats.geo_grid_dbscan_cores(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def md5_52(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)

    cells = {}
    for d in docs.doc_id:
        cx = (md5_52(f"{d}:lat") % 1800001) // textstats.DBSCAN_CELL
        cy = (md5_52(f"{d}:lon") % 3600001) // textstats.DBSCAN_CELL
        cells[(cx, cy)] = cells.get((cx, cy), 0) + 1
    n_docs = len(docs)
    assert len(out) == len(cells)
    for r in out.itertuples():
        assert r.n == cells[(r.cx, r.cy)]
        nb = sum(
            cells.get((r.cx + dx, r.cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        assert r.nb_count == nb
        exp_core = int(
            nb * textstats.DBSCAN_N_CELLS
            >= textstats.DBSCAN_FACTOR * 9 * n_docs
        )
        assert r.is_core == exp_core
