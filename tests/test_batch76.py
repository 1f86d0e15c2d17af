"""Tests: round-4 session-16 batch 76 — k-core peeling, label
propagation, ClickHouse-style retention conditions."""

from __future__ import annotations

import collections

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


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


def test_kcore_recompute(spark, sf_dir):
    out = relational.kcore_peel_rounds(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    nodes = {n for e in edges for n in e}
    assert len(out) == relational.KCORE_ROUNDS
    for r in range(1, relational.KCORE_ROUNDS + 1):
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        surv = {n for n in nodes if deg[n] >= relational.KCORE_K}
        removed = len(nodes) - len(surv)
        edges = {(a, b) for a, b in edges if a in surv and b in surv}
        nodes = surv
        row = out[out["round"] == r].iloc[0]
        assert row.n_removed == removed
        assert row.n_survivors == len(surv)
        assert row.n_edges == len(edges)
    # peeling must be monotone: survivors never grow
    assert list(out.n_survivors) == sorted(out.n_survivors, reverse=True)


def test_lpa_recompute(spark, sf_dir):
    out = relational.label_propagation_parts(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    brand = dict(zip(part.p_partkey, part.p_brand))
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    labels = {n: brand[n] for n in adj}
    assert len(out) == len(adj)
    hist = [dict(labels)]
    for _ in range(relational.LPA_ITERS):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = collections.Counter(labels[v] for v in nbrs)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[n] = best[0]
        labels = nxt
        hist.append(dict(labels))
    for r in out.itertuples():
        assert r.label_init == hist[0][r.p_partkey]
        assert r.label_1 == hist[1][r.p_partkey]
        assert r.label_2 == hist[2][r.p_partkey]


def test_retention_recompute(spark, sf_dir):
    out = parity.retention_conditions(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    d7, d14 = parity.RETENTION_WINDOWS_D
    n_users = ev.user_id.nunique()
    signup = ev[ev.event_type == "signup"].groupby("user_id").us.min()
    pur = ev[ev.event_type == "purchase"]
    n7 = n14 = 0
    for uid, t0 in signup.items():
        pu = pur[pur.user_id == uid].us
        after = pu[pu > t0]
        if (after <= t0 + d7 * 86400000000).any():
            n7 += 1
        if (after <= t0 + d14 * 86400000000).any():
            n14 += 1
    assert r.n_users == n_users
    assert r.n_signed_up == len(signup)
    assert r.n_ret_7d == n7 and r.n_ret_14d == n14
    assert abs(r.ret_7d_rate - n7 / len(signup)) < 5e-7
    assert abs(r.ret_14d_rate - n14 / len(signup)) < 5e-7
    # windows nest: 14d retention can never be below 7d retention
    assert r.n_ret_14d >= r.n_ret_7d
