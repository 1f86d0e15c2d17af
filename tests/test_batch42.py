"""Tests: round-4 session-13 batch 42 (QPP predictors, shingle profile, SAX
symbols, PageRank, streaming range percolator) — independent recomputes."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, relational, textstats


def test_qdp_recompute(spark, sf_dir):
    out = fulltext.query_difficulty_predictors(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    n = len(toks)
    df, cf = Counter(), Counter()
    for ts in toks.values():
        cf.update(ts)
        df.update(set(ts))
    got = {r.query_id: r for r in out.itertuples()}
    for qid, qtext in fulltext.QDP_QUERIES:
        terms = sorted(set(tokenize_string(qtext)))
        terms = [t for t in terms if df[t] > 0]
        idfs = [math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms]
        scq = sum((1.0 + math.log(cf[t])) * i for t, i in zip(terms, idfs))
        r = got[qid]
        assert r.n_terms == len(terms)
        assert abs(r.avg_idf - round(sum(idfs) / len(idfs), 6)) < 1e-6
        assert abs(r.max_idf - round(max(idfs), 6)) < 1e-9
        assert abs(r.scq - round(scq, 6)) < 1e-6


def test_shingle_profile_recompute(spark, sf_dir):
    out = textstats.shingle_uniqueness_profile(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    all_toks = [tokenize_string(r.text) for r in docs.itertuples()]
    got = {int(r.w): r for r in out.itertuples()}
    prev_u = None
    for w in textstats.SHINGLE_PROFILE_WS:
        shingles = Counter()
        for ts in all_toks:
            for i in range(len(ts) - w + 1):
                shingles[" ".join(ts[i : i + w])] += 1
        r = got[w]
        assert r.total_shingles == sum(shingles.values())
        assert r.distinct_shingles == len(shingles)
        u = round(len(shingles) / sum(shingles.values()), 6)
        assert abs(r.uniqueness - u) < 1e-9
        if prev_u is not None:  # wider shingles are more unique
            assert u >= prev_u
        prev_u = u


def test_sax_recompute(spark, sf_dir):
    out = parity.sax_daily_symbols(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].dt.normalize().dt.date
    counts = days.value_counts().sort_index()
    cal = pd.date_range(counts.index.min(), counts.index.max(), freq="D").date
    ns = np.array([counts.get(d, 0) for d in cal], dtype=np.float64)
    mean = ns.sum() / len(ns)
    std = math.sqrt((ns * ns).sum() / len(ns) - mean * mean)
    z = (ns - mean) / std
    w = parity.SAX_WINDOW_DAYS
    for r in out.itertuples():
        seg = z[r.window_id * w : (r.window_id + 1) * w]
        assert r.n_days == len(seg)
        paa = seg.sum() / len(seg)
        assert abs(r.paa - round(paa, 6)) < 1e-6
        b1, b2, b3 = parity.SAX_BREAKPOINTS
        exp = "a" if paa < b1 else "b" if paa < b2 else "c" if paa < b3 else "d"
        assert r.symbol == exp
    assert len(out) == math.ceil(len(ns) / w)


def test_pagerank_recompute(spark, sf_dir):
    out = relational.part_pagerank_3iter(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_n[(parts[i], parts[j])] += 1
    adj = defaultdict(list)
    for (a, b), c in pair_n.items():
        if c >= relational.AFFINITY_MIN_SUPPORT:
            adj[a].append(b)
            adj[b].append(a)
    n = len(adj)
    d = relational.PAGERANK_D
    r = {v: 1.0 / n for v in adj}
    for _ in range(relational.PAGERANK_ITERS):
        nxt = {}
        for v in adj:
            s = sum(
                sorted(round(d * r[u] / len(adj[u]), 12) for u in adj[v])
            )
            nxt[v] = (1.0 - d) / n + s
        r = nxt
    ranked = sorted(((round(pr, 6), v) for v, pr in r.items()), key=lambda t: (-t[0], t[1]))
    exp = ranked[: relational.PAGERANK_TOP_K]
    got = [(round(float(x.pagerank), 6), int(x.part)) for x in out.itertuples()]
    assert got == exp
    # probability mass is conserved (undirected graph, no dangling nodes)
    assert abs(sum(r.values()) - 1.0) < 1e-6


def test_streaming_percolate_range_matches_batch(spark, sf_dir):
    from lucene_mapreduce_spark.streaming.incremental import (
        streaming_percolate_range,
    )

    stream = streaming_percolate_range(spark, sf_dir).toPandas()
    batch = fulltext.percolate_range_match(spark, sf_dir).toPandas()
    assert sorted(zip(stream["query_id"], stream["doc_id"])) == sorted(
        zip(batch["query_id"], batch["doc_id"])
    )
