"""Tests: round-4 session-16 batch 98 — local clustering coefficient,
Jain fairness index, file overlap depth."""

from __future__ import annotations

import collections

import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    return set(
        cnt[cnt >= relational.AFFINITY_MIN_SUPPORT].index.tolist()
    )


def test_local_clustering_recompute(spark, sf_dir):
    out = relational.local_clustering_topk(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lcc = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(
            1
            for a in nbrs
            for b in nbrs
            if a < b and b in adj[a]
        )
        lcc[v] = (d, t, round(2.0 * t / (d * (d - 1)), 6))
    exp = sorted(lcc.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    assert len(out) == min(20, len(exp))
    for r, (v, (d, t, c)) in zip(out.itertuples(), exp):
        assert r.p_partkey == v
        assert (r.d, r.t) == (d, t)
        assert abs(r.lcc - c) < 1e-6


def test_jain_recompute(spark, sf_dir):
    out = relational.jain_fairness_index(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    x = ev.user_id.value_counts().values.astype("int64")
    j = (x.sum() ** 2) / (len(x) * (x * x).sum())
    assert r.n_users == len(x)
    assert r.n_events == int(x.sum())
    assert abs(r.jain_index - j) < 5e-7
    # near-uniform synthetic traffic: the index must read as fair
    assert r.jain_index > 0.9


def test_overlap_depth_recompute(spark, sf_dir):
    out = relational.file_overlap_depth(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d_us"] = o.o_orderdate.astype("int64")

    def ntile(n, k):
        base, extra = divmod(n, k)
        out_ = []
        for f in range(1, k + 1):
            out_ += [f] * (base + (1 if f <= extra else 0))
        return out_

    rows = {r.layout: r for r in out.itertuples()}
    for lname, cols in (
        ("arrival", ["o_orderkey"]),
        ("date_sorted", ["d_us", "o_orderkey"]),
    ):
        s = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
        s["f"] = ntile(len(s), relational.SKIP_N_FILES)
        g = s.groupby("f").d_us.agg(["min", "max"])
        depths = []
        for f, row in g.iterrows():
            depth = sum(
                1
                for f2, r2 in g.iterrows()
                if f2 != f and row["min"] <= r2["max"]
                and row["max"] >= r2["min"]
            )
            depths.append(depth)
        r = rows[lname]
        assert r.n_files == len(g)
        assert abs(r.mean_overlap_depth - sum(depths) / len(depths)) < 1e-6
        assert r.max_overlap_depth == max(depths)
    # clustering must collapse overlap depth dramatically
    assert (
        rows["date_sorted"].mean_overlap_depth
        < rows["arrival"].mean_overlap_depth / 4
    )
