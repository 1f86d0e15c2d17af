"""Tests: round-4 session-14 batch 61 — Pareto share curve, new-vs-
returning split, output file sizing, MLM masking plan, PQ refine."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, similarity, textstats


def test_pareto_share_recompute(spark, sf_dir):
    out = parity.pareto_share_curve(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["rev"] = ev.value.round(2)
    per = ev.groupby("user_id").rev.sum().round(2)
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    # ntile split: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    total = round(per.sum(), 2)
    idx = 0
    cum = 0.0
    assert list(out.decile) == list(range(1, 11))
    for row in out.itertuples(index=False):
        size = base + (1 if row.decile <= extra else 0)
        chunk = ranked[idx : idx + size]
        idx += size
        rev = round(sum(v for _, v in chunk), 2)
        cum = round(cum + rev, 2)
        assert row.n_users == size
        assert abs(row.revenue - rev) < 1e-9
        assert abs(row.share - round(rev / total, 6)) < 1e-9
        assert abs(row.cum_share - round(cum / total, 6)) < 1e-6
    # top decile dominates a skew-free uniform stream only mildly; the
    # curve must still be monotone in cumulative share
    assert out.cum_share.is_monotonic_increasing
    assert abs(out.cum_share.iloc[-1] - 1.0) < 1e-6


def test_new_vs_returning_recompute(spark, sf_dir):
    out = parity.new_vs_returning_daily(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.astype("int64") // (86400 * 10**6)
    pairs = ev[["user_id", "day"]].drop_duplicates()
    first = pairs.groupby("user_id").day.min()
    got = out.set_index("day")
    for day, g in pairs.groupby("day"):
        new = sum(1 for u in g.user_id if first[u] == day)
        assert got.loc[day].n_new == new
        assert got.loc[day].n_returning == len(g) - new
    # every user is new exactly once
    assert out.n_new.sum() == len(first)


def test_file_sizing_recompute(spark, sf_dir):
    out = parity.output_file_sizing_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    t = parity.FILE_SIZING_TARGET_BYTES
    for row in out.itertuples(index=False):
        g = docs[docs.source == row.source]
        tb = int(g.n_chars.sum())
        nf = (tb + t - 1) // t
        assert row.n_docs == len(g)
        assert row.total_bytes == tb
        assert row.n_files == nf
        assert row.rows_per_file == (len(g) + nf - 1) // nf
        assert row.bytes_per_file == (tb + nf - 1) // nf
        # the plan actually hits the target band
        assert row.bytes_per_file <= t
        assert row.n_files * row.bytes_per_file >= tb


def _u52(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16) / 2**52


def test_mlm_masking_recompute(spark, sf_dir):
    out = textstats.mlm_masking_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    by_id = dict(zip(docs.doc_id, docs.text))
    for row in out.itertuples(index=False):
        ts = tokenize_string(by_id[row.doc_id])
        masked = [
            i
            for i in range(1, len(ts) + 1)
            if _u52(f"{row.doc_id}:mask:{i}") < textstats.MLM_MASK_RATE
        ]
        acts = [_u52(f"{row.doc_id}:act:{i}") for i in masked]
        n_mask = sum(1 for a in acts if a < textstats.MLM_MASK_TOK)
        n_rand = sum(
            1
            for a in acts
            if textstats.MLM_MASK_TOK <= a < textstats.MLM_RANDOM
        )
        assert row.n_tokens == len(ts)
        assert row.n_masked == len(masked)
        assert row.n_mask_tok == n_mask
        assert row.n_random == n_rand
        assert row.n_keep == len(masked) - n_mask - n_rand
        want = hashlib.md5(",".join(str(i) for i in masked).encode()).hexdigest()
        assert row.witness == want
    # global rates land near the design point
    frac = out.n_masked.sum() / out.n_tokens.sum()
    assert 0.10 < frac < 0.20


def test_pq_rescore_is_exact_order_of_shortlist(spark, sf_dir):
    out = similarity.pq_rescore_topk(spark, sf_dir).toPandas()
    shortlist = similarity.ann_pq_topk(
        spark, sf_dir, k=similarity.PQ_SHORTLIST
    ).toPandas()
    want = shortlist.sort_values(["exact_dist", "vec_id"]).head(10)
    assert list(out.vec_id) == list(want.vec_id)
    assert list(out.exact_dist) == list(want.exact_dist)
    assert list(out["rank"]) == list(range(1, 11))
    # refine must beat-or-match the raw ADC head on exact distance
    adc_head = shortlist.sort_values(["approx_dist", "vec_id"]).head(10)
    assert out.exact_dist.mean() <= adc_head.exact_dist.mean() + 1e-12
