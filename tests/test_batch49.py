"""Tests: round-4 session-14 batch 49 — independent recomputes of the
cross_fields scorer, span position range, negated percolation, quality
threshold sweep, tokenizer fertility, and the dimension covariance
audit."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, similarity, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_cross_fields_recompute(spark, sf_dir):
    out = fulltext.cross_fields_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = {r.doc_id: tokenize_string(r.text) for r in docs.itertuples()}
    src = dict(zip(docs["doc_id"], docs["source"]))
    qts = sorted(set(tokenize_string(fulltext.BM25F_QUERY)))
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for t in qts:
        df_text = sum(1 for ts in toks.values() if t in ts)
        df_kw = sum(1 for s in src.values() if s == t)
        dfb = float(max(df_text, df_kw))
        idf = math.log(1.0 + (n - dfb + 0.5) / (dfb + 0.5))
        for d, ts in toks.items():
            tf = ts.count(t)
            sat_t = (
                tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                if tf
                else 0.0
            )
            sat_k = 1.0 if src[d] == t else 0.0
            best = max(sat_t, sat_k)
            if best > 0:
                scores[d] = scores.get(d, 0.0) + idf * best
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    assert list(out["doc_id"]) == [d for d, _s in ranked]
    for got, (_d, s) in zip(out["score"], ranked):
        assert abs(got - round(s, 6)) < 1e-6


def test_span_position_range_recompute(spark, sf_dir):
    out = fulltext.span_position_range_query(spark, sf_dir).toPandas()
    term, lo, hi = fulltext.SPAN_POS_RANGE
    exp = {}
    for r in _docs(sf_dir).itertuples():
        ts = tokenize_string(r.text)
        c = sum(1 for p, t in enumerate(ts) if t == term and lo <= p < hi)
        if c:
            exp[r.doc_id] = c
    assert dict(zip(out["doc_id"], out["n_in_range"])) == exp


def test_percolate_not_recompute(spark, sf_dir):
    out = fulltext.percolate_not_match(spark, sf_dir).toPandas()
    got = set(zip(out["query_id"], out["doc_id"]))
    exp = set()
    for r in _docs(sf_dir).itertuples():
        ts = set(tokenize_string(r.text))
        for qid, qtext, negterm in fulltext.PERCOLATE_NOT_QUERIES:
            req = set(tokenize_string(qtext))
            if req <= ts and negterm not in ts:
                exp.add((qid, r.doc_id))
    assert got == exp


def test_quality_threshold_sweep_recompute(spark, sf_dir):
    out = textstats.quality_threshold_sweep(spark, sf_dir).toPandas()
    q = textstats.quality_score(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)[["doc_id", "source"]]
    j = q.merge(docs, on="doc_id")
    for thr in textstats.QUALITY_THRESHOLDS:
        for s, grp in j.groupby("source"):
            row = out[(out["threshold"] == thr) & (out["source"] == s)]
            kept = int((grp["quality"] >= thr).sum())
            assert int(row["n_kept"].iloc[0]) == kept
            assert int(row["n_docs"].iloc[0]) == len(grp)
            assert abs(row["keep_rate"].iloc[0] - round(kept / len(grp), 6)) < 1e-9
    # monotone: keep rate never rises with the threshold
    piv = out.pivot(index="source", columns="threshold", values="keep_rate")
    assert (piv.values[:, :-1] >= piv.values[:, 1:]).all()


def test_tokenizer_fertility_recompute(spark, sf_dir):
    import re

    out = textstats.tokenizer_fertility_by_lang(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    pat = re.compile(r"[a-zA-Z0-9]+|[^a-zA-Z0-9 ]")
    rows = []
    for r in docs.itertuples():
        rows.append(
            {
                "lang": r.lang,
                "ws": len(tokenize_string(r.text)),
                "bpe": len(pat.findall(r.text)),
                "chars": r.n_chars,
            }
        )
    ref = pd.DataFrame(rows)
    got = out.set_index("lang")
    for lang, grp in ref.groupby("lang"):
        assert int(got.loc[lang, "total_ws_words"]) == int(grp["ws"].sum())
        assert int(got.loc[lang, "total_bpe_tokens"]) == int(grp["bpe"].sum())
        assert (
            abs(
                got.loc[lang, "fertility"]
                - round(grp["bpe"].sum() / grp["ws"].sum(), 6)
            )
            < 1e-9
        )
        assert (
            abs(
                got.loc[lang, "chars_per_token"]
                - round(grp["chars"].sum() / grp["bpe"].sum(), 6)
            )
            < 1e-9
        )


def test_covariance_topk_recompute(spark, sf_dir):
    out = similarity.covariance_topk_dims(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.array(emb["embedding"].tolist(), dtype=np.float64)
    n, d = vecs.shape
    # exact covariance from 12dp-rounded sums, like both engines
    sx = np.round(vecs, 12).sum(axis=0)
    sxy = np.zeros((d, d))
    for i in range(d):
        sxy[i] = np.round(vecs[:, i][:, None] * vecs, 12).sum(axis=0)
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            cov = (sxy[i, j] - sx[i] * sx[j] / n) / n
            rows.append((i, j, round(cov, 6), round(abs(cov), 6)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    top = rows[: similarity.COV_TOP_K]
    assert list(zip(out["di"], out["dj"])) == [(i, j) for i, j, _c, _a in top]
    for got, (_i, _j, c, _a) in zip(out["cov"], top):
        assert abs(got - c) < 2e-6
