"""Tests: round-4 session-15 batch 72 — log-merge plan, SCD2 intervals,
shard allocation plan, sort-missing-last."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.operators import fulltext, parity


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_log_merge_plan_recompute(spark, sf_dir):
    out = parity.log_merge_plan(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.astype("int64") // (86400 * 10**6)
    segs = ev.groupby(["day", "event_type"]).size()
    lv = segs.apply(lambda n: len(str(n)) - 1)
    want = lv.value_counts().sort_index()
    assert list(out.level) == list(want.index)
    assert list(out.n_segments) == list(want)
    for r in out.itertuples():
        assert r.n_merges == r.n_segments // parity.LOG_MERGE_FACTOR
        assert r.n_left_at_level == r.n_segments % parity.LOG_MERGE_FACTOR


def test_scd2_intervals_recompute(spark, sf_dir):
    out = parity.scd2_user_state_intervals(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"])
    rows = []
    for u, g in ev.groupby("user_id"):
        prev = None
        for r in g.itertuples():
            if prev is None or r.event_type != prev:
                rows.append([u, len([x for x in rows if x[0] == u]) + 1,
                             r.event_type, r.us])
            prev = r.event_type
    want = pd.DataFrame(
        rows, columns=["user_id", "version", "state", "valid_from_us"]
    )
    assert len(out) == len(want)
    got = out[["user_id", "version", "state", "valid_from_us"]].reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got.astype({"version": "int64"}),
        want.astype({"version": "int64"}),
        check_dtype=False,
    )
    # interval chaining: valid_to == next valid_from within a user; the
    # last version per user is open and flagged current
    for u, g in out.groupby("user_id"):
        g = g.sort_values("version")
        for a, b in zip(g.itertuples(), list(g.itertuples())[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.is_current == 0
        assert g.iloc[-1].is_current == 1
        assert pd.isna(g.iloc[-1].valid_to_us)


def test_shard_allocation_recompute(spark, sf_dir):
    out = parity.shard_allocation_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    shard = docs.doc_id.map(
        lambda d: _md5_52(f"{d}:shard") % parity.N_ALLOC_SHARDS
    )
    per_shard = shard.value_counts().sort_index()
    prim = {n: 0 for n in range(parity.N_ALLOC_NODES)}
    repl = dict(prim)
    dp = dict(prim)
    dt = dict(prim)
    for s, n in per_shard.items():
        p, r = s % parity.N_ALLOC_NODES, (s + 1) % parity.N_ALLOC_NODES
        prim[p] += 1
        repl[r] += 1
        dp[p] += n
        dt[p] += n
        dt[r] += n
    for r in out.itertuples():
        assert r.n_primary == prim[r.node]
        assert r.n_replica == repl[r.node]
        assert r.docs_primary == dp[r.node]
        assert r.docs_total == dt[r.node]
    # primary and replica of any shard are never colocated (nodes >= 2)
    assert (out.n_primary + out.n_replica).sum() == 2 * parity.N_ALLOC_SHARDS


def test_sort_missing_last(spark, sf_dir):
    out = fulltext.search_sort_missing_last(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["num"] = [
        n if _md5_52(f"{d}:mv") % 4 != 0 else None
        for d, n in zip(docs.doc_id, docs.n_chars)
    ]
    ordered = docs.sort_values(
        ["num", "doc_id"], na_position="last"
    ).head(fulltext.SORT_MISSING_K)
    assert list(out.doc_id) == list(ordered.doc_id)
    got_num = [None if pd.isna(x) else int(x) for x in out.num]
    want_num = [None if pd.isna(x) else int(x) for x in ordered.num]
    assert got_num == want_num
    assert list(out["rank"]) == list(range(1, len(out) + 1))
