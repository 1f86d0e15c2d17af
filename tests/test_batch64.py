"""Tests: round-4 session-14 batch 64 — grouping sets, embedding
anisotropy, session entry conversion."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity


def test_grouping_sets_recompute(spark, sf_dir):
    out = parity.grouping_sets_agg(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = (ev.ts.astype("int64") // (86400 * 10**6)).astype(str)
    by_type = ev.groupby("event_type").size()
    by_day = ev.groupby("day").size()
    by_both = ev.groupby(["event_type", "day"]).size()
    # gid 1 = (event_type) set, gid 2 = (day) set, gid 0 = both
    g1 = out[out.gid == 1]
    assert dict(zip(g1.event_type, g1.n_events)) == by_type.to_dict()
    assert set(g1.day) == {"<all>"}
    g2 = out[out.gid == 2]
    assert dict(zip(g2.day, g2.n_events)) == by_day.to_dict()
    assert set(g2.event_type) == {"<all>"}
    g0 = out[out.gid == 0]
    assert {
        (r.event_type, r.day): r.n_events for r in g0.itertuples(index=False)
    } == by_both.to_dict()
    assert len(out) == len(by_type) + len(by_day) + len(by_both)


def test_anisotropy_matches_bruteforce(spark, sf_dir):
    out = similarity.embedding_anisotropy(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    norms = np.linalg.norm(m, axis=1)
    u = m[norms > 0] / norms[norms > 0, None]
    n = len(u)
    # brute force: mean over all ordered pairs i != j
    g = u @ u.T
    mean_pair = (g.sum() - np.trace(g)) / (n * (n - 1))
    row = out.iloc[0]
    assert row.n_vectors == n
    # the engine rounds per-dim components at 12dp first — 1e-6 window
    assert abs(row.mean_pairwise_cosine - mean_pair) < 1e-6


def test_session_entry_conversion_recompute(spark, sf_dir):
    out = parity.session_entry_conversion(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    gap = parity.SESSION_GAP_S * 1_000_000
    stats: dict[str, list] = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        entry, types, last = None, [], None
        sessions = []
        for r in g.itertuples():
            if last is None or r.us - last >= gap:
                if entry is not None:
                    sessions.append((entry, types))
                entry, types = r.event_type, []
            types.append(r.event_type)
            last = r.us
        sessions.append((entry, types))
        for e, ts in sessions:
            stats.setdefault(e, []).append(
                int(parity.ATTR_CONVERSION in ts)
            )
    got = {r.entry: r for r in out.itertuples(index=False)}
    assert set(got) == set(stats)
    for e, flags in stats.items():
        r = got[e]
        assert r.n_sessions == len(flags)
        assert r.n_converted == sum(flags)
        assert abs(
            r.conversion_rate - round(sum(flags) / len(flags), 6)
        ) < 1e-9
