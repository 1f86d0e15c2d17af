"""Tests: round-4 session-16 batch 108 — token-bucket rate limiting."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_token_bucket_recompute(spark, sf_dir):
    out = parity.token_bucket_rate_limit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="mergesort")
    n_ok = n_drop = 0
    for _, g in ev.groupby("user_id"):
        tok, last = parity.TB_BURST, None
        for us in g.us:
            if last is not None:
                tok = min(
                    parity.TB_BURST,
                    tok + (us - last) / 1e6 * parity.TB_RATE_PER_S,
                )
            if tok >= 1.0:
                tok -= 1.0
                n_ok += 1
            else:
                n_drop += 1
            last = us
    assert r.n_users == ev.user_id.nunique()
    assert r.n_allowed == n_ok
    assert r.n_dropped == n_drop
    assert abs(r.drop_rate - n_drop / (n_ok + n_drop)) < 5e-7
    # one event per ~13 minutes per user vs 1/min refill: both outcomes
    # must be realized for the gate to mean anything
    assert r.n_allowed > 0 and r.n_dropped > 0
