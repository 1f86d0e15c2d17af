"""Tests: round-4 session-11 batch 24 (as-of join, domain entropy,
MinHash-vs-exact Jaccard audit) — independent pandas recomputes."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, parity, textstats


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_asof_join_matches_merge_asof_semantics(spark, sf_dir):
    out = parity.asof_join(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    views = ev[ev["event_type"] == parity.ASOF_RIGHT_TYPE]
    purch = ev[ev["event_type"] == parity.ASOF_LEFT_TYPE]
    assert len(out) == len(purch)
    by_user: dict[int, list] = {
        int(u): g.sort_values(["ts", "event_id"]).to_records(index=False)
        for u, g in views.groupby("user_id")
    }
    got = out.set_index("event_id")
    for r in purch.itertuples():
        cands = [
            (v.ts, v.event_id)
            for v in views[views["user_id"] == r.user_id].itertuples()
            if v.ts <= r.ts
        ]
        row = got.loc[int(r.event_id)]
        assert int(row.ts_us) == int(pd.Timestamp(r.ts).value // 1000)
        if not cands:
            assert pd.isna(row.view_event_id)
            continue
        best_ts = max(t for t, _ in cands)
        best_id = max(e for t, e in cands if t == best_ts)
        assert int(row.view_event_id) == int(best_id)
        want_gap = (pd.Timestamp(r.ts).value - pd.Timestamp(best_ts).value) // 1000
        assert int(row.gap_us) == want_gap
        assert row.gap_us >= 0


def test_domain_entropy_recompute(spark, sf_dir):
    out = textstats.domain_entropy(spark, sf_dir).toPandas().set_index("source")
    docs = _docs(sf_dir)
    for src, grp in docs.groupby("source"):
        n = len(grp)
        h = 0.0
        for lang in sorted(grp["lang"].unique()):
            p = (grp["lang"] == lang).sum() / n
            h += p * math.log(p)
        row = out.loc[src]
        assert int(row.n_docs) == n
        assert int(row.n_langs) == grp["lang"].nunique()
        assert abs(row.entropy - round(-h, 6)) < 1e-9
        assert 0.0 <= row.entropy <= math.log(max(row.n_langs, 1)) + 1e-9


def _shingles(text: str) -> set[str]:
    t = tokenize_string(text)
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_minhash_audit_recompute(spark, sf_dir):
    out = dedup.minhash_jaccard_audit(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).set_index("doc_id")
    assert len(out) > 0  # planted near-dups must produce audit rows
    for r in out.itertuples():
        sa, sb = _shingles(docs.loc[r.doc_a, "text"]), _shingles(
            docs.loc[r.doc_b, "text"]
        )
        # estimator: fraction of equal min-hash components over UNCAPPED shingles
        eq = 0
        for i in range(dedup.N_MINHASH):
            ma = min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sa)
            mb = min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in sb)
            eq += ma == mb
        want = round(eq / dedup.N_MINHASH, 6)
        assert abs(r.mh_est - want) < 1e-9
        assert abs(r.abs_err - round(abs(r.mh_est - r.jaccard), 6)) < 1e-9
        # a >=0.5-Jaccard pair should mostly agree on minhashes
        assert r.mh_est >= 0.25


def test_streaming_topk_keys_equals_batch(spark, sf_dir):
    import json

    from lucene_mapreduce_spark.streaming.incremental import (
        TOPK_KEYS_K,
        streaming_topk_keys,
    )

    out = streaming_topk_keys(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev = ev.assign(
        day=ev["ts"].dt.strftime("%Y-%m-%d"),
        k=[json.loads(p)["k"] for p in ev["props"]],
    )
    counts = ev.groupby(["day", "k"]).size().reset_index(name="n")
    for day, grp in counts.groupby("day"):
        want = grp.sort_values(["n", "k"], ascending=[False, True]).head(
            TOPK_KEYS_K
        )
        got = out[out["day"] == day].sort_values("rank")
        assert list(got["k"]) == list(want["k"])
        assert list(got["n"]) == list(want["n"])
    assert set(out["rank"]) == set(range(1, TOPK_KEYS_K + 1))
