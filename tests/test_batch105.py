"""Tests: round-4 session-16 batch 105 — Dn rolling retention."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_dn_retention_recompute(spark, sf_dir):
    out = parity.dn_retention_summary(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ud = set(
        zip(ev.user_id, ev.ts.astype("int64") // 86400000000)
    )
    hi = max(d for _, d in ud)
    rows = {r.offset_d: r for r in out.itertuples()}
    assert set(rows) == set(parity.DN_OFFSETS)
    for n in parity.DN_OFFSETS:
        base = [(u, d) for u, d in ud if d + n <= hi]
        retained = sum(1 for u, d in base if (u, d + n) in ud)
        r = rows[n]
        assert r.n_base == len(base)
        assert r.n_retained == retained
        assert abs(r.retention_rate - retained / len(base)) < 5e-7
    # daily-active synthetic users: D1 should not be below D7 by much
    assert rows[1].retention_rate > 0.5
