"""Tests: round-4 session-14 batch 50 — independent recomputes of
match_bool_prefix, payload scoring, block-join avg, ERR@k, the global
agg, and the 1-bit binary-quantization recall audit."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, similarity
from lucene_mapreduce_spark.query.bm25 import B, K1


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _bm25_scores(docs, query_text):
    toks = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    qts = sorted(set(tokenize_string(query_text)))
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for t in qts:
        df = sum(1 for ts in toks.values() if t in ts)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(t)
            if tf:
                sat = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * sat
    return scores, toks


def test_match_bool_prefix_recompute(spark, sf_dir):
    out = fulltext.match_bool_prefix_query(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    full, prefix = fulltext.MATCH_BOOL_PREFIX
    scores, toks = _bm25_scores(docs, full)
    fused = dict(scores)
    for d, ts in toks.items():
        if any(t.startswith(prefix) for t in ts):
            fused[d] = fused.get(d, 0.0) + 1.0
    ranked = sorted(fused.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _s in ranked]
    for got, (_d, s) in zip(out["score"], ranked):
        assert abs(got - round(s, 6)) < 1e-6


def test_payload_score_recompute(spark, sf_dir):
    out = fulltext.payload_score_query(spark, sf_dir).toPandas()
    term = fulltext.PAYLOAD_TERM
    exp = {}
    npos = {}
    for r in _docs(sf_dir).itertuples():
        for p, t in enumerate(tokenize_string(r.text)):
            if t == term:
                pay = _md5_52(f"pl:{term}:{r.doc_id}:{p}") % 16 + 1
                exp[r.doc_id] = exp.get(r.doc_id, 0) + pay
                npos[r.doc_id] = npos.get(r.doc_id, 0) + 1
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["doc_id"], out["payload_score"])) == ranked
    assert list(out["n_positions"]) == [npos[d] for d, _ in ranked]


def test_block_join_avg_recompute(spark, sf_dir):
    out = fulltext.block_join_avg_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    scores, _toks = _bm25_scores(docs, fulltext.FLAGSHIP_QUERY)
    groups = {}
    for d, s in scores.items():
        groups.setdefault(d // fulltext.BLOCK_WIDTH, []).append(round(s, 6))
    rows = [
        (p, round(sum(v) / len(v), 6), len(v)) for p, v in groups.items()
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    top = rows[:10]
    assert list(out["parent_id"]) == [p for p, _s, _n in top]
    assert list(out["n_children"]) == [n for _p, _s, n in top]
    for got, (_p, s, _n) in zip(out["score"], top):
        assert abs(got - s) < 2e-6


def test_err_at_k_recompute(spark, sf_dir):
    out = fulltext.err_at_k(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k, min_terms = fulltext.RANK_EVAL_K, fulltext.RANK_EVAL_MIN_TERMS
    terms = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    gmax = len(terms) - (min_terms - 1)
    scores, toks = _bm25_scores(docs, fulltext.FLAGSHIP_QUERY)
    page = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    rels = []
    nrel = 0
    for d, _s in page:
        nmatch = len(set(terms) & set(toks[d]))
        rel = max(0, nmatch - (min_terms - 1))
        rels.append(rel)
        nrel += rel > 0
    err, prod = 0.0, 1.0
    for i, rel in enumerate(rels, start=1):
        r = (2.0**rel - 1.0) / 2.0**gmax
        err += r / i * prod
        prod *= 1.0 - r
    assert int(out["n_rel"].iloc[0]) == nrel
    assert abs(out["err"].iloc[0] - round(err, 6)) < 1e-6


def test_global_agg_recompute(spark, sf_dir):
    out = fulltext.global_agg(spark, sf_dir).toPandas().set_index("scope")
    docs = _docs(sf_dir)
    hit = docs["text"].map(
        lambda t: fulltext.GLOBAL_AGG_TERM in tokenize_string(t)
    )
    for scope, grp in (("global", docs), ("query", docs[hit])):
        assert int(out.loc[scope, "n_docs"]) == len(grp)
        assert int(out.loc[scope, "total_chars"]) == int(grp["n_chars"].sum())
        assert (
            abs(
                out.loc[scope, "avg_chars"]
                - round(grp["n_chars"].sum() / len(grp), 6)
            )
            < 1e-9
        )
    # the query bucket is strictly inside the global one
    assert int(out.loc["query", "n_docs"]) < int(out.loc["global", "n_docs"])


def test_binary_quantization_recall_recompute(spark, sf_dir):
    out = similarity.binary_quantization_recall(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    bits = vecs >= 0
    k, n_probes = similarity.BQ_RECALL_K, similarity.BQ_RECALL_PROBES
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    got = dict(zip(out["query_id"], out["n_overlap"]))
    assert len(out) == n_probes
    for q in range(n_probes):
        qi = int(np.where(ids == q)[0][0])
        mask = ids != q
        cand_ids = ids[mask]
        cos = np.round(
            (vecs[mask] @ vecs[qi]) / (norms[mask] * norms[qi]), 6
        )
        ham = (bits[mask] != bits[qi]).sum(axis=1)
        top_f = set(
            cand_ids[np.lexsort((cand_ids, -cos))][:k].tolist()
        )
        top_b = set(cand_ids[np.lexsort((cand_ids, ham))][:k].tolist())
        assert got[q] == len(top_f & top_b)
