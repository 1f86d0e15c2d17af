"""Tests: round-4 session-17 batch 119 — runs test, Shapley attribution,
personalized PageRank."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_runs_test_recompute(spark, sf_dir):
    out = parity.runs_test_daily(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    counts = days.value_counts().reindex(cal, fill_value=0).sort_index()
    med = float(np.percentile(counts.values, 50))  # type-7, the engine rule
    signs = [1 if c > med else 0 for c in counts.values if float(c) != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:]))
    n = len(signs)
    mu = 2.0 * n1 * n2 / n + 1.0
    var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
    assert (out.n_days_used, out.n_above, out.n_below) == (n, n1, n2)
    assert out.n_runs == runs
    assert abs(out.exp_runs - mu) < 1e-6
    assert abs(out.z_stat - (runs - mu) / np.sqrt(var)) < 1e-6
    # the test must have both sides populated to be meaningful
    assert n1 > 0 and n2 > 0


def _shapley_expected(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.dt.normalize()
    buys = ev[ev.event_type == "purchase"]
    t0 = buys.groupby(["user_id", "day"]).ts.min()
    bit = dict(parity.SHAPLEY_CHANNELS)
    conv = Counter()
    for (u, d), first in t0.items():
        pre = ev[
            (ev.user_id == u)
            & (ev.day == d)
            & (ev.ts < first)
            & (ev.event_type != "purchase")
        ]
        m = 0
        for t in set(pre.event_type):
            m |= bit[t]
        conv[m] += 1
    v = {t: sum(c for m, c in conv.items() if (m & t) == m) for t in range(16)}
    credit = {}
    for c, b in parity.SHAPLEY_CHANNELS:
        tot = 0
        for t in range(16):
            if t & b:
                continue
            pc = bin(t).count("1")
            w24 = {0: 6, 1: 2, 2: 2, 3: 6}[pc]
            tot += w24 * (v[t | b] - v[t])
        credit[c] = tot
    return conv, v, credit


def test_shapley_recompute(spark, sf_dir):
    out = parity.shapley_attribution(spark, sf_dir).toPandas()
    conv, v, credit = _shapley_expected(sf_dir)
    assert list(out.channel) == sorted(credit)
    for row in out.itertuples():
        assert row.credit24 == credit[row.channel]
        assert abs(row.shapley - row.credit24 / 24.0) < 1e-6
    # efficiency axiom: channel credits sum to v(full) - v(empty), exactly
    assert out.credit24.sum() == 24 * (v[15] - v[0])
    # at least one conversion is channel-attributable in the fixture
    assert v[15] > v[0]


def test_personalized_pagerank_recompute(spark, sf_dir):
    out = relational.personalized_pagerank(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for a, b in combinations(parts, 2):
            pair_n[(a, b)] += 1
    adj = defaultdict(list)
    for (a, b), c in pair_n.items():
        if c >= relational.AFFINITY_MIN_SUPPORT:
            adj[a].append(b)
            adj[b].append(a)
    d = relational.PPR_D
    seed = min(adj)
    r = {x: 1.0 if x == seed else 0.0 for x in adj}
    for _ in range(relational.PPR_ITERS):
        nxt = {}
        for x in adj:
            s = sum(sorted(round(d * r[u] / len(adj[u]), 12) for u in adj[x]))
            nxt[x] = ((1.0 - d) if x == seed else 0.0) + s
        r = nxt
    ranked = sorted(
        ((round(pr, 6), x) for x, pr in r.items() if pr > 0),
        key=lambda t: (-t[0], t[1]),
    )[: relational.PPR_TOP_K]
    got = [(round(float(x.ppr), 6), int(x.part)) for x in out.itertuples()]
    assert got == ranked
    # the seed dominates its own restart distribution
    assert out.iloc[0].part == seed
    # walk mass is conserved: sum over ALL nodes == 1 (restart + spread)
    assert abs(sum(r.values()) - 1.0) < 1e-6
