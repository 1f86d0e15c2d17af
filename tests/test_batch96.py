"""Tests: round-4 session-16 batch 96 — quantization granularity,
bloom join pushdown."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import relational, similarity


def test_quant_granularity_recompute(spark, sf_dir):
    out = similarity.quantization_granularity_audit(
        spark, sf_dir
    ).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.stack(emb.embedding.values).astype(np.float64)

    def scheme_err(mn, mx):
        scale = (mx - mn) / 255.0
        with np.errstate(invalid="ignore", divide="ignore"):
            code = np.round((v - mn) / scale)
        deq = np.where(mx == mn, mn, mn + code * scale)
        err = v - deq
        e2 = np.round(err * err, 12)
        ae = np.round(np.abs(err), 12)
        return float(e2.mean()), float(ae.max())

    mse_pc, max_pc = scheme_err(
        v.min(axis=0, keepdims=True), v.max(axis=0, keepdims=True)
    )
    mse_pt, max_pt = scheme_err(v.min(), v.max())
    rows = {r.scheme: r for r in out.itertuples()}
    assert rows["per_channel"].n_components == v.size
    assert abs(rows["per_channel"].mse - mse_pc) < 1e-9
    assert abs(rows["per_tensor"].mse - mse_pt) < 1e-9
    assert abs(rows["per_channel"].max_abs_err - max_pc) < 1e-5
    assert abs(rows["per_tensor"].max_abs_err - max_pt) < 1e-5
    # per-channel grids can never lose to the global grid on MSE
    assert rows["per_channel"].mse <= rows["per_tensor"].mse + 1e-12


def test_bloom_join_recompute(spark, sf_dir):
    out = relational.bloom_join_pushdown_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    d = orders.o_orderdate.astype("int64")
    build = set(
        orders.o_orderkey[
            (d >= 883612800000000) & (d <= 891302400000000)
        ]
    )

    def b(k):
        return (
            int(hashlib.md5(f"{k}:bj".encode()).hexdigest()[:13], 16)
            % relational.BLOOM_JOIN_BITS
        )

    bset = {b(k) for k in build}
    n_pass = sum(1 for k in li.l_orderkey if b(k) in bset)
    n_match = int(li.l_orderkey.isin(build).sum())
    assert r.n_build_keys == len(build)
    assert r.n_probe == len(li)
    assert r.n_match == n_match
    assert r.n_pass == n_pass
    assert r.false_passes == n_pass - n_match
    assert abs(r.shuffle_reduction - (1 - n_pass / len(li))) < 5e-7
    # the filter must be lossless (no false negatives) and useful
    assert r.n_pass >= r.n_match
    assert r.shuffle_reduction > 0.5
