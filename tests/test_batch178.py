"""Tests: round-4 session-18 batch 178 — NRR, centroid stability, truss."""

from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational, similarity


def test_nrr_recompute(spark, sf_dir):
    out = relational.net_revenue_retention(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o.assign(month=o.o_orderdate.dt.strftime("%Y-%m"))
    per = (
        o.groupby(["o_custkey", "month"])
        .o_totalprice.apply(lambda s: s.round(2).sum())
        .round(2)
    )
    m0 = out.month_base.iloc[0]
    m1 = out.month_next.iloc[0]
    base = per.xs(m0, level="month")
    cur = per.xs(m1, level="month") if m1 in o.month.values else pd.Series()
    rev1 = base.index.map(lambda c: cur.get(c, 0.0))
    row = out.iloc[0]
    assert row.n_base_customers == len(base)
    assert row.n_retained == int((rev1 > 0).sum())
    assert abs(row.nrr - rev1.values.sum() / base.sum()) < 1e-5
    grr = sum(min(a, b) for a, b in zip(base.values, rev1)) / base.sum()
    assert abs(row.grr - grr) < 1e-5
    assert (out.grr <= out.nrr + 1e-9).all()  # capping can only lower


def test_centroid_stability_recompute(spark, sf_dir):
    out = similarity.label_centroid_stability(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.assign(
        h=emb.vec_id.map(
            lambda i: int(
                hashlib.md5(f"lcs:{i}".encode()).hexdigest()[:13], 16
            )
            % 2
        )
    )
    mats = {
        (r.label, r.h): [] for r in emb.itertuples()
    }
    for r in emb.itertuples():
        mats[(r.label, r.h)].append(
            np.round(np.asarray(r.embedding, dtype=np.float64), 6)
        )
    labels = sorted(emb.label.unique())
    full = {
        lb: np.mean(
            [v for h in (0, 1) for v in mats.get((lb, h), [])], axis=0
        )
        for lb in labels
    }
    lb = out.label.iloc[0]
    c0 = np.mean(mats[(lb, 0)], axis=0)
    c1 = np.mean(mats[(lb, 1)], axis=0)
    within = float(np.linalg.norm(c0 - c1))
    between = np.mean(
        [
            round(float(np.linalg.norm(full[lb] - full[o_])), 12)
            for o_ in labels
            if o_ != lb
        ]
    )
    row = out[out.label == lb].iloc[0]
    assert row.n_vectors == (emb.label == lb).sum()
    assert abs(row.within_half_dist - within) < 1e-4
    assert abs(row.between_label_mean - between) < 1e-4
    assert abs(row.stability_ratio - within / between) < 1e-3


def test_triangle_support_recompute(spark, sf_dir):
    out = relational.edge_triangle_support(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pairs = Counter()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp.l_partkey)), 2):
            pairs[(a, b)] += 1
    edges = {e for e, n in pairs.items() if n >= 2}
    sup = Counter()
    es = edges
    for (a, b) in es:
        for (c, d) in es:
            if c == b:
                if (a, d) in es:  # triangle a<b<d via wedge a-b-d
                    sup[(a, b)] += 1
                    sup[(b, d)] += 1
                    sup[(a, d)] += 1
    hist = Counter(sup.get(e, 0) for e in edges)
    for row in out.itertuples():
        assert row.n_edges == hist[row.support]
        assert row.total_edges == len(edges)
        assert row.truss3_edges == sum(
            v for k, v in hist.items() if k >= 1
        )
