"""Tests: round-4 session-12 batch 33 (MMR re-rank, RBO, posting audit,
degree histogram, session duration rollup) — independent recomputes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import curation, dedup, fulltext, parity, similarity


def _emb(sf_dir: str):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in df.itertuples()}


def _cos(a, b):
    # sequential fold in component order, matching the engine contract
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (na ** 0.5 * nb ** 0.5)


def test_mmr_recompute(spark, sf_dir):
    out = similarity.mmr_diversified_topk(spark, sf_dir).toPandas()
    vecs = _emb(sf_dir)
    q = vecs[0]
    rel = {v: round(_cos(vecs[v], q), 6) for v in vecs if v != 0}
    cand = sorted(rel, key=lambda v: (-rel[v], v))[: similarity.MMR_DEPTH]
    lam = similarity.MMR_LAMBDA
    chosen, want = [], []
    for step in range(similarity.MMR_K):
        best = None
        for v in cand:
            if v in chosen:
                continue
            if not chosen:
                s = rel[v]
            else:
                s = lam * rel[v] - (1.0 - lam) * max(
                    round(_cos(vecs[v], vecs[c]), 6) for c in chosen
                )
            if best is None or s > best[1]:
                best = (v, s)
        chosen.append(best[0])
        want.append((step + 1, best[0], round(best[1], 6)))
    got = [(int(r.rank), int(r.vec_id), r.mmr) for r in out.itertuples()]
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, _, a), (_, _, b) in zip(got, want))
    # diversification must actually change the pure-relevance order
    pure = [v for v in cand[: similarity.MMR_K]]
    assert [v for _, v, _ in got] != pure or len(set(pure)) < similarity.MMR_K


def test_rbo_recompute(spark, sf_dir):
    out = similarity.rank_biased_overlap(spark, sf_dir).toPandas().iloc[0]
    depth, p = similarity.RBO_DEPTH, similarity.RBO_P
    lex = fulltext.bm25_index_topk_documents(spark, sf_dir, k=depth).toPandas()
    vec = similarity.ann_bruteforce_topk(spark, sf_dir, k=depth).toPandas()
    A = list(lex.sort_values("rank")["doc_id"].astype(int))
    Bl = list(vec.sort_values("rank")["vec_id"].astype(int))
    rbo = 0.0
    for d in range(1, depth + 1):
        ov = len(set(A[:d]) & set(Bl[:d]))
        rbo += (1.0 - p) * p ** (d - 1) * ov / d
    assert abs(out.rbo - round(rbo, 6)) < 1e-6
    assert 0.0 <= out.rbo <= 1.0


def test_index_posting_audit_recompute(spark, sf_dir):
    out = fulltext.index_posting_audit(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    postings = {}
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            postings[(int(r.doc_id), t)] = postings.get((int(r.doc_id), t), 0) + 1
    assert int(out.n_postings) == len(postings)
    assert int(out.total_tokens) == sum(postings.values())
    assert int(out.n_docs) == len({d for d, _ in postings})
    assert int(out.n_terms) == len({t for _, t in postings})
    assert int(out.max_tf) == max(postings.values())


def test_degree_histogram_consistency(spark, sf_dir):
    edges = dedup.minhash_lsh_pairs(spark, sf_dir).toPandas()
    out = curation.near_dup_degree_histogram(spark, sf_dir).toPandas()
    deg = {}
    for r in edges.itertuples():
        deg[int(r.doc_a)] = deg.get(int(r.doc_a), 0) + 1
        deg[int(r.doc_b)] = deg.get(int(r.doc_b), 0) + 1
    want = pd.Series(list(deg.values())).value_counts().sort_index()
    assert list(out["degree"]) == list(want.index)
    assert list(out["n_docs"]) == list(want.values)
    # handshake: sum(degree * count) = 2 |E|
    assert (out["degree"] * out["n_docs"]).sum() == 2 * len(edges)


def test_session_duration_recompute(spark, sf_dir):
    out = parity.session_duration_stats(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    gap_us = parity.SESSION_GAP_S * 1_000_000
    sessions = []
    for _, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        start = us[0]
        last = us[0]
        n = 1
        for t in us[1:]:
            if t - last >= gap_us:
                sessions.append((n, last - start))
                start, n = t, 0
            n += 1
            last = t
        sessions.append((n, last - start))
    n_s = len(sessions)
    assert int(out.n_sessions) == n_s
    assert int(out.n_users) == ev["user_id"].nunique()
    assert abs(out.mean_events - round(sum(n for n, _ in sessions) / n_s, 6)) < 1e-9
    assert (
        abs(out.mean_duration_s - round(sum(d for _, d in sessions) / n_s / 1e6, 6))
        < 1e-6
    )
    assert abs(out.max_duration_s - round(max(d for _, d in sessions) / 1e6, 6)) < 1e-9
