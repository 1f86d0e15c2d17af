"""Tests: round-4 session-14 batch 59 — curation funnel, windowFunnel,
ingest-pipeline simulate, query-relaxation ladder."""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import curation, fulltext, parity, textstats


def test_curation_funnel_is_monotone_and_consistent(spark, sf_dir):
    out = curation.curation_funnel_report(spark, sf_dir).toPandas()
    flags = curation.curation_pipeline(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source"]]
    f = flags.merge(docs, on="doc_id")
    for row in out.itertuples(index=False):
        g = f[f.source == row.source]
        s1 = g.pred_lang == "en"
        s2 = s1 & (g.quality >= curation.QUALITY_FLOOR)
        s3 = s2 & g.is_keeper
        assert row.n_docs == len(g)
        assert row.n_lang == int(s1.sum())
        assert row.n_quality == int(s2.sum())
        assert row.n_dedup == int(s3.sum())
        assert row.n_kept == int(g.kept.sum())
        # funnel stages only shrink
        assert row.n_docs >= row.n_lang >= row.n_quality >= row.n_dedup >= row.n_kept
    assert set(out.source) == set(docs.source)


def _funnel_depth_brute(views, clicks, purchases, w):
    """Exhaustive chain search — the spec the greedy implementation
    must match."""
    best = 1 if views else 0
    for v in views:
        for c in clicks:
            if v < c <= v + w:
                best = max(best, 2)
                for p in purchases:
                    if c < p <= v + w:
                        return 3
    return best


def test_window_funnel_matches_bruteforce(spark, sf_dir):
    out = parity.window_funnel_steps(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["es"] = ev.ts.astype("int64") // 10**6
    w = parity.FUNNEL_WINDOW_S
    s0, s1, s2 = parity.WINDOW_FUNNEL_STEPS
    depths: dict[int, int] = {}
    for _, g in ev.groupby("user_id"):
        d = _funnel_depth_brute(
            sorted(g[g.event_type == s0].es),
            sorted(g[g.event_type == s1].es),
            sorted(g[g.event_type == s2].es),
            w,
        )
        depths[d] = depths.get(d, 0) + 1
    got = dict(zip(out.depth, out.n_users))
    assert got == depths


def test_ingest_pipeline_recompute(spark, sf_dir):
    out = textstats.ingest_pipeline_simulate(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    by_id = dict(zip(docs.doc_id, docs.text))
    assert list(out.doc_id) == sorted(by_id)
    for row in out.itertuples(index=False):
        norm = re.sub(r"[0-9]+", "0", by_id[row.doc_id].lower())
        parts = tokenize_string(norm)
        assert row.n_parts == len(parts)
        want = hashlib.md5(" ".join(parts).encode()).hexdigest()
        assert row.fingerprint == want


def test_relaxation_ladder_recompute(spark, sf_dir):
    out = fulltext.query_relaxation_ladder(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toksets = {r.doc_id: set(tokenize_string(r.text)) for r in docs.itertuples()}
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    df = {t: sum(1 for s in toksets.values() if t in s) for t in qts}
    order = sorted(qts, key=lambda t: (-df[t], t))
    assert len(out) == len(order)
    prev = -1
    for row in out.itertuples(index=False):
        remaining = order[row.step :]
        assert row.n_terms == len(remaining)
        assert row.terms == ",".join(sorted(remaining))
        want = sum(1 for s in toksets.values() if all(t in s for t in remaining))
        assert row.n_hits == want
        # dropping the commonest term can only widen the hit set
        assert row.n_hits >= prev
        prev = row.n_hits
