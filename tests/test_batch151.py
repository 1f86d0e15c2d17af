"""Tests: round-4 session-18 batch 151 — modularity, Atkinson, clarity."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, relational


def _edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pairs = Counter()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(set(grp.l_partkey)), 2):
            pairs[(a, b)] += 1
    return [e for e, n in pairs.items() if n >= 2]


def test_modularity_recompute(spark, sf_dir):
    out = relational.modularity_brand_partition(spark, sf_dir).toPandas()
    edges = _edges(sf_dir)
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    brand = dict(zip(part.p_partkey, part.p_brand))
    m = len(edges)
    deg = Counter()
    intra = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        if brand[a] == brand[b]:
            intra[brand[a]] += 1
    dsum = Counter()
    nn = Counter()
    for node, d in deg.items():
        dsum[brand[node]] += d
        nn[brand[node]] += 1
    assert out.deg_sum.sum() == 2 * m
    for row in out.itertuples():
        assert row.n_nodes == nn[row.p_brand]
        assert row.deg_sum == dsum[row.p_brand]
        assert row.intra_edges == intra[row.p_brand]
        q = intra[row.p_brand] / m - (dsum[row.p_brand] / (2 * m)) ** 2
        assert abs(row.contribution - q) < 1e-6
    # the partition's total modularity is the sum of contributions
    assert -1 <= out.contribution.sum() <= 1


def test_atkinson_recompute(spark, sf_dir):
    out = relational.atkinson_index_segments(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for row in out.itertuples():
        x = j[j.c_mktsegment == row.c_mktsegment].o_totalprice
        mean = x.mean()
        ede = x.map(math.sqrt).mean() ** 2
        assert row.n_orders == len(x)
        assert abs(row.mean_price - mean) < 1e-4
        assert abs(row.ede_price - ede) < 1e-3
        assert abs(row.atkinson_05 - (1 - ede / mean)) < 1e-6
        assert 0 <= row.atkinson_05 < 1
    assert list(out.c_mktsegment) == sorted(out.c_mktsegment)


def test_clarity_recompute(spark, sf_dir):
    out = fulltext.query_clarity_score(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # page via the golden pandas scorer (rank 1..k by rounded score)
    from lucene_mapreduce_spark.query.bm25 import bm25_oracle_pandas

    page = bm25_oracle_pandas(
        docs, fulltext.FLAGSHIP_QUERY, k=fulltext.CLARITY_K
    )
    top = set(page.doc_id)
    page_tf = Counter()
    corpus_tf = Counter()
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        corpus_tf.update(toks)
        if r.doc_id in top:
            page_tf.update(toks)
    len_r = sum(page_tf.values())
    t = sum(corpus_tf.values())
    clarity = sum(
        (tf / len_r) * math.log((tf / len_r) / (corpus_tf[w] / t))
        for w, tf in page_tf.items()
    )
    assert out.k_used == len(top)
    assert out.page_tokens == len_r
    assert out.n_terms == len(page_tf)
    assert abs(out.clarity - clarity) < 1e-5
    assert out.clarity > 0
