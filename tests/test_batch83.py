"""Tests: round-4 session-16 batch 83 — 2-hop harmonic centrality,
duplicate-order detection, RLE encodability audit."""

from __future__ import annotations

import collections

import pandas as pd

from lucene_mapreduce_spark.operators import relational


def test_harmonic_2hop_recompute(spark, sf_dir):
    out = relational.harmonic_centrality_2hop(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    edges = cnt[cnt >= relational.AFFINITY_MIN_SUPPORT].index.tolist()
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    cent = {}
    for u, n1 in adj.items():
        two = set()
        for v in n1:
            two |= adj[v]
        two -= n1
        two.discard(u)
        cent[u] = (len(n1), len(two), len(n1) + len(two) / 2.0)
    exp = sorted(cent.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    assert len(out) == min(20, len(exp))
    for r, (u, (n1, n2, c)) in zip(out.itertuples(), exp):
        assert r.p_partkey == u
        assert (r.n1, r.n2) == (n1, n2)
        assert abs(r.centrality - c) < 1e-9


def test_duplicate_orders_recompute(spark, sf_dir):
    out = relational.duplicate_order_detection(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["tp"] = (o.o_totalprice.round(2) * 100).round().astype("int64")
    o["day"] = o.o_orderdate.astype("int64") // 86400000000
    exp = []
    for cust, g in o.groupby("o_custkey"):
        rows = g.sort_values("o_orderkey").itertuples()
        rows = list(rows)
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if (
                    abs(a.day - b.day) <= relational.DUP_ORDER_WINDOW_D
                    and abs(a.tp - b.tp)
                    <= relational.DUP_ORDER_PRICE_BAND * 100
                ):
                    exp.append(
                        (
                            cust,
                            a.o_orderkey,
                            b.o_orderkey,
                            abs(a.tp - b.tp) / 100.0,
                            abs(a.day - b.day),
                        )
                    )
    exp.sort()
    assert len(out) == len(exp)
    for r, (cust, oa, ob, pdiff, gap) in zip(out.itertuples(), exp):
        assert (r.o_custkey, r.ok_a, r.ok_b) == (cust, oa, ob)
        assert abs(r.price_diff - pdiff) < 5e-3
        assert r.day_gap == gap


def test_rle_audit_recompute(spark, sf_dir):
    out = relational.rle_encodability_audit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def runs(series):
        return int((series != series.shift()).sum())

    arr = docs.sort_values("doc_id").lang
    clu = docs.sort_values(["lang", "doc_id"]).lang
    rows = {r.layout: r for r in out.itertuples()}
    assert rows["arrival"].n_runs == runs(arr.reset_index(drop=True))
    assert rows["lang_clustered"].n_runs == runs(clu.reset_index(drop=True))
    assert rows["arrival"].n_rows == len(docs)
    # clustering must collapse runs to exactly the language cardinality
    assert rows["lang_clustered"].n_runs == docs.lang.nunique()
    assert rows["lang_clustered"].n_runs < rows["arrival"].n_runs
