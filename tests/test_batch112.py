"""Tests: round-4 session-17 batch 112 — link prediction scores and
truncated Katz index over the co-order part graph."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    return set(cnt[cnt >= 2].index)


def test_link_prediction_recompute(spark, sf_dir):
    out = relational.link_prediction_scores(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    assert len(out) == relational.LINKPRED_K
    assert list(out["rank"]) == list(range(1, relational.LINKPRED_K + 1))
    for r in out.itertuples():
        u, v = int(r.u), int(r.v)
        assert (u, v) not in edges  # non-edges only
        common = nbrs[u] & nbrs[v]
        assert r.cn == len(common)
        assert abs(
            r.jaccard - len(common) / len(nbrs[u] | nbrs[v])
        ) < 1e-6
        aa = sum(round(1.0 / math.log(len(nbrs[w])), 12) for w in common)
        ra = sum(round(1.0 / len(nbrs[w]), 12) for w in common)
        assert abs(r.adamic_adar - aa) < 1e-5
        assert abs(r.resource_alloc - ra) < 1e-5
    # scores descend
    assert (out.adamic_adar.diff().dropna() <= 1e-9).all()


def test_katz_recompute(spark, sf_dir):
    out = relational.katz_index_pairs(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for a, b in edges:
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    A2 = A @ A
    A3 = A2 @ A
    for r in out.itertuples():
        u, v = idx[int(r.u)], idx[int(r.v)]
        assert (int(r.u), int(r.v)) not in edges
        assert r.w2 == A2[u, v]
        assert r.w3 == A3[u, v]
        assert abs(r.katz - (2500 * r.w2 + 125 * r.w3) / 1e6) < 1e-12
    assert len(out) == relational.KATZ_K
    kz = 2500 * out.w2 + 125 * out.w3
    assert (kz.diff().dropna() <= 0).all()
