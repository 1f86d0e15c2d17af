"""Tests: round-4 session-18 batch 164 — merge ladder, EF audit, CCC."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity


def test_merge_ladder_recompute(spark, sf_dir):
    out = fulltext.tiered_merge_ladder_plan(spark, sf_dir).toPandas()
    nd = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    n_flush = (nd + 999) // 1000
    tiers = [t for t in range(10) if 10**t <= n_flush]
    merge_docs = sum(
        (n_flush // 10**t) * 10**t * 1000 for t in tiers if t > 0
    )
    wa = (merge_docs + nd) / nd
    assert list(out.tier) == tiers
    for row in out.itertuples():
        assert row.segment_docs == 1000 * 10**row.tier
        assert row.n_segments == (n_flush // 10**row.tier) % 10
        assert abs(row.write_amp - wa) < 1e-6
    # the ladder must account for every flushed doc
    assert (out.n_segments * out.segment_docs).sum() == n_flush * 1000


def test_elias_fano_recompute(spark, sf_dir):
    out = fulltext.elias_fano_size_audit(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    post = defaultdict(list)
    for r in docs.itertuples():
        for t in set(tokenize_string(r.text)):
            post[t].append(r.doc_id)
    u = max(d for v in post.values() for d in v) + 1
    ef_bytes = 0
    vb_bytes = 0
    for t, ids in post.items():
        ids.sort()
        n = len(ids)
        lb = (u // n).bit_length() - 1
        ef_bytes += (n * lb + 2 * n + 7) // 8
        prev = -1
        for d in ids:
            g = d - prev
            vb_bytes += (
                1 + (g >= 128) + (g >= 16384) + (g >= 2097152)
            )
            prev = d
    assert out.n_terms == len(post)
    assert out.total_postings == sum(len(v) for v in post.values())
    assert out.ef_bytes == ef_bytes
    assert out.vb_bytes == vb_bytes
    assert abs(out.ef_over_varbyte - ef_bytes / vb_bytes) < 1e-6


def test_lins_ccc_recompute(spark, sf_dir):
    out = parity.lins_ccc_order_totals(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = li.groupby("l_orderkey").l_extendedprice.apply(
        lambda s: s.round(2).sum()
    )
    j = o[o.o_orderkey.isin(y.index)]
    x = j.o_totalprice.round(2).to_numpy()
    yy = y[j.o_orderkey].to_numpy()
    n = len(x)
    mx, my = x.mean(), yy.mean()
    vx, vy = x.var(), yy.var()
    cxy = ((x - mx) * (yy - my)).mean()
    ccc = 2 * cxy / (vx + vy + (mx - my) ** 2)
    r = cxy / np.sqrt(vx * vy)
    assert out.n_pairs == n
    assert abs(out.mean_shift - (mx - my)) < 1e-4
    assert abs(out.pearson_r - r) < 1e-6
    assert abs(out.lins_ccc - ccc) < 1e-6
    assert abs(out.bias_correction_cb - ccc / r) < 1e-6
    assert abs(out.lins_ccc) <= abs(out.pearson_r) + 1e-9  # CCC <= |r|
