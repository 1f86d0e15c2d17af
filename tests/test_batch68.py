"""Tests: round-4 session-14 batch 68 — sliding-window streaming gate."""

from __future__ import annotations

import pandas as pd


def test_streaming_sliding_counts_recompute(spark, sf_dir):
    from lucene_mapreduce_spark.streaming.incremental import (
        streaming_sliding_counts,
    )

    out = streaming_sliding_counts(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["h"] = ev.ts.astype("int64") // (3600 * 10**6)
    want: dict[tuple, int] = {}
    for r in ev.itertuples():
        for off in (0, 1):
            start = pd.Timestamp((r.h - off) * 3600 * 10**9).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            want[(start, r.event_type)] = want.get((start, r.event_type), 0) + 1
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in out.itertuples(index=False)
    }
    assert got == want
    # every event is in exactly two windows
    assert out.n_events.sum() == 2 * len(ev)
