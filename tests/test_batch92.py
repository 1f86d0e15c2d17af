"""Tests: round-4 session-16 batch 92 — CDC chunk histogram, recsys
coverage/novelty, l-diversity."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.operators import textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_cdc_recompute(spark, sf_dir):
    out = textstats.cdc_chunk_histogram(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    W, D = textstats.CDC_WGRAM, textstats.CDC_DIVISOR
    hist = {}
    for t in docs.text:
        if len(t) < W:
            continue
        cuts = [
            i
            for i in range(W, len(t) + 1)
            if _md5_52(t[i - W : i]) % D == 0
        ]
        starts = [0] + cuts
        ends = cuts + [len(t)]
        for a, b in zip(starts, ends):
            clen = b - a
            if clen <= 0:
                continue
            bk = clen // D
            n, tot = hist.get(bk, (0, 0))
            hist[bk] = (n + 1, tot + clen)
    assert len(out) == len(hist)
    for r in out.itertuples():
        n, tot = hist[r.bucket]
        assert (r.n_chunks, r.total_chars) == (n, tot)
    # CDC must actually cut: multiple buckets and >1 chunk per doc avg
    assert out.n_chunks.sum() > len(docs)


def test_recsys_recompute(spark, sf_dir):
    out = textstats.recsys_coverage_novelty(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x != m.l_partkey_y]
    co = (
        m.groupby(["l_partkey_x", "l_partkey_y"])
        .size()
        .reset_index(name="c")
    )
    co = co.sort_values(
        ["l_partkey_x", "c", "l_partkey_y"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    recs = co.groupby("l_partkey_x").head(textstats.RECSYS_TOPK)
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    pop = li.l_partkey.value_counts()
    n_total = len(li)
    nov = [
        round(-math.log2(pop[p] / n_total), 12)
        for p in recs.l_partkey_y
    ]
    assert r.n_recommended == recs.l_partkey_y.nunique()
    assert r.n_catalog == len(part)
    assert abs(
        r.catalog_coverage - recs.l_partkey_y.nunique() / len(part)
    ) < 5e-7
    assert r.n_lists == len(recs)
    assert abs(r.mean_novelty - sum(nov) / len(nov)) < 1e-5


def test_l_diversity_recompute(spark, sf_dir):
    out = textstats.l_diversity_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["len_b"] = docs.n_chars // 200
    g = docs.groupby(["source", "len_b"]).agg(
        n=("lang", "size"), l_div=("lang", "nunique")
    )
    assert r.n_classes == len(g)
    assert r.l_min == int(g.l_div.min())
    below = g[g.l_div < textstats.L_DIVERSITY_MIN]
    assert r.classes_below_l == len(below)
    assert r.docs_below_l == int(below.n.sum())
