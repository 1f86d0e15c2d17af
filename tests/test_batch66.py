"""Tests: round-4 session-14 batch 66 — pruned percolation, item-item
cosine, per-dim quartiles."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import fulltext, relational, similarity


def test_percolate_pruned_equals_full(spark, sf_dir):
    pruned = fulltext.percolate_pruned(spark, sf_dir).toPandas()
    full = fulltext.percolate_match(spark, sf_dir).toPandas()
    assert list(map(tuple, pruned.values)) == list(map(tuple, full.values))
    assert len(pruned) > 0


def test_item_cosine_recompute(spark, sf_dir):
    out = relational.item_cosine_similarity(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    deg = li.groupby("l_partkey").size()
    co: dict[tuple, int] = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g.l_partkey)
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                co[(a, b)] = co.get((a, b), 0) + 1
    scored = [
        (round(n / np.sqrt(deg[a] * deg[b]), 6), a, b, n)
        for (a, b), n in co.items()
        if n >= relational.AFFINITY_MIN_SUPPORT
    ]
    want = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[
        : relational.ITEM_COSINE_TOP_K
    ]
    assert [(r.pa, r.pb) for r in out.itertuples(index=False)] == [
        (a, b) for _, a, b, _n in want
    ]
    for r, (c, _a, _b, n) in zip(out.itertuples(index=False), want):
        assert r.n_ab == n
        assert abs(r.cosine - c) < 1e-9
    # cosine is bounded
    assert ((out.cosine > 0) & (out.cosine <= 1.0)).all()


def test_dim_quartiles_recompute(spark, sf_dir):
    out = similarity.embedding_dim_quartiles(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    assert list(out.dim) == list(range(m.shape[1]))
    for r in out.itertuples(index=False):
        col = m[:, r.dim]
        assert r.n == len(col)
        assert abs(r.q1 - round(float(np.percentile(col, 25)), 6)) < 1e-9
        assert abs(r.median - round(float(np.percentile(col, 50)), 6)) < 1e-9
        assert abs(r.q3 - round(float(np.percentile(col, 75)), 6)) < 1e-9
        assert r.q1 <= r.median <= r.q3
