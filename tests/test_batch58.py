"""Tests: round-4 session-14 batch 58 — graph explore, LTR feature log,
code-switch detection, burst bot detection."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats
from lucene_mapreduce_spark.operators.textstats import STOPWORDS


def test_graph_explore_recompute(spark, sf_dir):
    out = fulltext.graph_explore(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toksets = {r.doc_id: set(tokenize_string(r.text)) for r in docs.itertuples()}
    seed = fulltext.GRAPH_SEED_TERM
    seed_docs = {d for d, ts in toksets.items() if seed in ts}
    co: dict[str, int] = {}
    for d in seed_docs:
        for t in toksets[d]:
            if t != seed:
                co[t] = co.get(t, 0) + 1
    hop1 = sorted(co.items(), key=lambda kv: (-kv[1], kv[0]))[: fulltext.GRAPH_H1]
    d1 = out[out.depth == 1].sort_values("rank")
    assert list(d1.term) == [t for t, _ in hop1]
    assert list(d1.score) == [c for _, c in hop1]
    assert set(d1.parent) == {seed}
    hop1_terms = {t for t, _ in hop1}
    d2 = out[out.depth == 2]
    for parent, grp in d2.groupby("parent"):
        pdocs = {d for d, ts in toksets.items() if parent in ts}
        co2: dict[str, int] = {}
        for d in pdocs:
            for t in toksets[d]:
                if t != seed and t not in hop1_terms:
                    co2[t] = co2.get(t, 0) + 1
        want = sorted(co2.items(), key=lambda kv: (-kv[1], kv[0]))[
            : fulltext.GRAPH_H2
        ]
        g = grp.sort_values("rank")
        assert list(g.term) == [t for t, _ in want]
        assert list(g.score) == [c for _, c in want]
    assert set(d2.parent) == hop1_terms


def test_ltr_feature_log_recompute(spark, sf_dir):
    from lucene_mapreduce_spark.query.bm25 import B, K1

    out = fulltext.ltr_feature_log(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in qts}
    rows = {}
    for d, v in toks.items():
        feats = [(t, v.count(t)) for t in qts if t in v]
        if not feats:
            continue
        score = 0.0
        for t, tf in feats:  # ascending-term sequential fold
            idf = np.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        rows[d] = {
            "n_matched": len(feats),
            "sum_tf": sum(tf for _, tf in feats),
            "max_tf": max(tf for _, tf in feats),
            "min_df": min(df[t] for t, _ in feats),
            "dl": len(v),
            "bm25": round(score, 6),
        }
    want = sorted(rows.items(), key=lambda kv: (-kv[1]["bm25"], kv[0]))[: fulltext.LTR_K]
    assert list(out.doc_id) == [d for d, _ in want]
    for row in out.itertuples(index=False):
        w = rows[row.doc_id]
        for f in ("n_matched", "sum_tf", "max_tf", "min_df", "dl"):
            assert getattr(row, f) == w[f], (row.doc_id, f)
        assert abs(row.bm25 - w["bm25"]) < 1e-9


def test_code_switch_recompute(spark, sf_dir):
    out = textstats.code_switch_stats(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per: dict[str, dict] = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        cnts = [sum(1 for t in ts if t in set(ws)) for ws in STOPWORDS.values()]
        total, maxc = sum(cnts), max(cnts)
        nl = sum(1 for c in cnts if c > 0)
        d = per.setdefault(r.source, {"n": 0, "marked": 0, "sw": 0, "mf": 0.0})
        d["n"] += 1
        if total > 0:
            d["marked"] += 1
            d["mf"] += round((total - maxc) / total, 12)
        if nl >= 2:
            d["sw"] += 1
    for row in out.itertuples(index=False):
        d = per[row.source]
        assert row.n_docs == d["n"]
        assert row.n_marked == d["marked"]
        assert row.n_switched == d["sw"]
        assert abs(row.mean_minority_frac - round(d["mf"] / d["marked"], 6)) < 1e-6
    # marked docs exist; switched docs may be 0 at tiny sf (the synthetic
    # vocab is English-ish — determinism is what the gate checks, the
    # language_id precedent)
    assert out.n_marked.sum() > 0


def test_bot_burst_recompute(spark, sf_dir):
    out = parity.bot_burst_detection(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["es"] = ev.ts.astype("int64") // 10**6
    wnd = parity.BURST_WINDOW_S
    for row in out.itertuples(index=False):
        s = np.sort(ev[ev.user_id == row.user_id].es.values)
        left = np.searchsorted(s, s - (wnd - 1), side="left")
        burst = (np.arange(len(s)) - left + 1).max()
        assert row.n_events == len(s)
        assert row.max_burst == burst
        assert row.is_bot == int(burst >= parity.BURST_BOT_THRESHOLD)
    assert set(out.user_id) == set(ev.user_id)
    # both classes appear at the pinned threshold on the synthetic stream
    assert 0 < out.is_bot.sum() < len(out)
