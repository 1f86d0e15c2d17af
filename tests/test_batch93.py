"""Tests: round-4 session-16 batch 93 — delta varint audit, AQE
coalesce plan, systematic sample audit."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.operators import relational


def _vbytes(v: int) -> int:
    return 1 if v <= 0 else (v.bit_length() + 6) // 7


def test_delta_varint_recompute(spark, sf_dir):
    out = relational.delta_varint_audit(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    vals = li.l_partkey.astype("int64")
    raw = sum(_vbytes(int(v)) for v in vals)
    s = li.sort_values(
        ["l_partkey", "l_orderkey", "l_linenumber"], kind="mergesort"
    ).l_partkey.astype("int64").tolist()
    deltas = [s[0]] + [b - a for a, b in zip(s, s[1:])]
    dbytes = sum(_vbytes(int(d)) for d in deltas)
    rows = {r.layout: r for r in out.itertuples()}
    assert rows["raw_varint"].total_bytes == raw
    assert rows["delta_sorted_varint"].total_bytes == dbytes
    assert rows["raw_varint"].n_values == len(vals)
    # sorting + deltas must beat raw encoding on a dense key
    assert dbytes < raw


def test_aqe_coalesce_recompute(spark, sf_dir):
    out = relational.aqe_coalesce_plan(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    parts = {}
    for u in ev.user_id:
        p = (
            int(hashlib.md5(f"{u}:aqe".encode()).hexdigest()[:13], 16)
            % relational.AQE_PARTITIONS
        )
        parts[p] = parts.get(p, 0) + 1
    total = sum(parts.values())
    target = (
        total + relational.AQE_TARGET_DIV - 1
    ) // relational.AQE_TARGET_DIV
    grp, run = 0, 0
    assign = {}
    for p in sorted(parts):
        if run >= target:
            grp += 1
            run = parts[p]
        else:
            run += parts[p]
        assign[p] = grp
    exp = {}
    for p, g in assign.items():
        n, r, fp, lp = exp.get(g, (0, 0, 10**9, -1))
        exp[g] = (n + 1, r + parts[p], min(fp, p), max(lp, p))
    assert len(out) == len(exp)
    for r in out.itertuples():
        n, rows_, fp, lp = exp[r.grp]
        assert (r.n_partitions, r.rows, r.first_p, r.last_p) == (
            n, rows_, fp, lp,
        )
    # coalescing must actually merge partitions
    assert out.n_partitions.sum() == len(parts)
    assert len(out) < len(parts)


def test_systematic_sample_recompute(spark, sf_dir):
    out = relational.systematic_sample_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    x = docs.n_chars.astype("int64").reset_index(drop=True)
    samp = x[
        x.index % relational.SYS_SAMPLE_K == relational.SYS_SAMPLE_OFFSET
    ]
    assert r.n_sample == len(samp)
    assert r.n_pop == len(x)
    assert abs(r.sample_mean - samp.mean()) < 5e-6
    assert abs(r.pop_mean - x.mean()) < 5e-6
    assert abs(
        r.rel_err - abs(samp.mean() - x.mean()) / x.mean()
    ) < 5e-6
