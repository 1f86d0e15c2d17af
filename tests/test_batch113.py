"""Tests: round-4 session-17 batch 113 — merge-on-read amplification,
RANGE-vs-ROWS frame gate."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _deleted(doc_id: int) -> bool:
    u = int(hashlib.md5(f"{doc_id}:mordel".encode()).hexdigest()[:13], 16)
    return u * 20 < 3 * (1 << 52)


def test_mor_amplification_recompute(spark, sf_dir):
    out = relational.merge_on_read_amplification(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.file_id: r for r in out.itertuples()}
    grp = docs.assign(
        fid=docs.doc_id // relational.MOR_FILE_ROWS,
        d=[_deleted(i) for i in docs.doc_id],
    ).groupby("fid")
    assert len(out) == grp.ngroups
    for fid, g in grp:
        r = rows[fid]
        nd = int(g.d.sum())
        assert (r.n_rows, r.n_deleted, r.n_live) == (
            len(g), nd, len(g) - nd,
        )
        assert abs(r.delete_frac - nd / len(g)) < 1e-6
        assert abs(r.read_amplification - len(g) / (len(g) - nd)) < 1e-6
        assert bool(r.rewrite_flag) == (
            round(nd / len(g), 6) >= relational.MOR_REWRITE_FRAC
        )
    # the global delete rate should be near the designed 15%
    frac = out.n_deleted.sum() / out.n_rows.sum()
    assert 0.05 < frac < 0.30


def test_range_rows_frame_gate_recompute(spark, sf_dir):
    out = parity.range_rows_frame_gate(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li[
        (li.l_shipdate >= pd.Timestamp("2000-03-01"))
        & (li.l_shipdate <= pd.Timestamp("2000-03-31"))
    ].copy()
    li["p"] = (li.l_extendedprice.round(2) * 100).round().astype("int64")
    li = li.sort_values(
        ["l_quantity", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    rows_cum = li.p.cumsum()
    range_cum = li.groupby("l_quantity").p.transform("sum").groupby(
        li.l_quantity
    ).transform("first")
    # RANGE cum = cumulative sum through the END of the current peer group
    last_in_group = li.groupby("l_quantity").cumcount(ascending=False) == 0
    group_end_cum = rows_cum.where(last_in_group).bfill()
    peers = li.groupby("l_quantity").p.transform("count")
    assert out.n_rows == len(li)
    assert out.n_peer_rows == int((peers > 1).sum())
    differing = int((group_end_cum != rows_cum).sum())
    assert out.n_differing == differing
    assert abs(out.max_gap - (group_end_cum - rows_cum).max() / 100.0) < 1e-6
    # ties exist in l_quantity, so the two frames MUST diverge somewhere
    assert out.n_differing > 0
