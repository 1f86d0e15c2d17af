"""BM25 scoring spec + brute-force float64 oracle.

The reference probes its Lucene index with ``TopScoreDocCollector`` and
Lucene's default similarity (reference: XdiReportReducer.java:355-371); the
north rule re-targets that relevance machinery to BM25. This module *is* the
scorer spec — every other path (DataFrame scan scorer, segment/WAND scorer,
DuckDB oracle SQL) must be rank-identical (equal scores, equal top-k docids)
to ``bm25_oracle_pandas``.

Spec (pinned, do not drift):
- tokenizer: functions.tokenize (whitespace, no normalization)
- k1 = 1.2, b = 0.75
- idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))          [Lucene BM25 idf]
- tfn(t,d)= tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
- score(q,d) = sum over *distinct* query terms t present in d of
               idf(t) * tfn(t,d), accumulated in float64 in ascending
               lexicographic term order (canonical order => the same bits
               regardless of partitioning / parallelism level)
- N = number of docs in the corpus, avgdl = mean token count (float64,
  zero-length docs included)
- top-k order: (score desc, doc_id asc); only docs matching >= 1 term appear
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string

K1: float = 1.2
B: float = 0.75


def bm25_idf(df_t: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))


def bm25_contribution(tf: float, dl: float, avgdl: float, idf: float) -> float:
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_oracle_pandas(
    docs: pd.DataFrame, query_text: str, k: int = 10
) -> pd.DataFrame:
    """Brute-force exact BM25 over a (doc_id, text) pandas frame.

    Returns columns (doc_id int64, score float64, rank int32), rank 1..k by
    (score desc, doc_id asc). This is the golden scorer for the pytest
    rank-identity suite — deliberately simple, no shared code with the
    engine paths beyond the tokenizer.
    """
    tokens = docs["text"].map(tokenize_string)
    dl = tokens.map(len).astype("float64")
    n_docs = len(docs)
    avgdl = float(dl.sum()) / n_docs if n_docs else 0.0

    q_terms = sorted(set(tokenize_string(query_text)))
    if not q_terms or n_docs == 0 or avgdl == 0.0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64"),
             "rank": pd.Series([], dtype="int32")}
        )

    doc_ids = docs["doc_id"].to_numpy()
    scores = np.zeros(n_docs, dtype=np.float64)
    matched = np.zeros(n_docs, dtype=bool)
    dl_arr = dl.to_numpy()

    # Canonical ascending-term accumulation order.
    term_tfs = {}
    for t in q_terms:
        tf = tokens.map(lambda toks, t=t: toks.count(t)).to_numpy(dtype=np.float64)
        term_tfs[t] = tf
    for t in q_terms:
        tf = term_tfs[t]
        df_t = int((tf > 0).sum())
        if df_t == 0:
            continue
        idf = bm25_idf(df_t, n_docs)
        denom = tf + K1 * (1.0 - B + B * dl_arr / avgdl)
        contrib = np.where(tf > 0, idf * (tf * (K1 + 1.0)) / np.where(denom == 0, 1, denom), 0.0)
        scores = scores + contrib
        matched |= tf > 0

    out = pd.DataFrame({"doc_id": doc_ids[matched], "score": scores[matched]})
    out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    out = out.head(k).reset_index(drop=True)
    out["rank"] = (out.index + 1).astype("int32")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out
