"""Tests: round-4 session-14 batch 69 — index rollover plan."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_rollover_plan_recompute(spark, sf_dir):
    out = parity.index_rollover_plan(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.astype("int64") // (86400 * 10**6)
    daily = ev.groupby("day").size().sort_index()
    cum = daily.cumsum()
    shard = (cum - 1) // parity.ROLLOVER_MAX_DOCS
    assert list(out.day) == list(daily.index)
    assert list(out.n_docs) == list(daily)
    assert list(out.cum_docs) == list(cum)
    assert list(out.shard) == list(shard)
    prev = None
    for r in out.itertuples(index=False):
        assert r.is_rollover_day == int(prev is None or r.shard != prev)
        prev = r.shard
    # the plan actually rolls at this threshold on the synthetic stream
    assert out.is_rollover_day.sum() >= 2
    # shard never decreases and steps by at most the per-day overflow
    assert out.shard.is_monotonic_increasing
