"""Tests: round-3 session-7 batch 12 (moving median / packing stats /
terms lookup / runtime field) — invariants beyond the DuckDB oracle
gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _daily_hist(sf_dir: str) -> list[int]:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev["ts"].dt.floor("D").dt.date
    counts = days.value_counts()
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    return [int(counts.get(d, 0)) for d in cal]


def test_moving_median_trailing_inclusive(spark, sf_dir):
    out = parity.moving_median_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    w = parity.MOVING_MEDIAN_WINDOW
    for i in range(len(hist)):
        frame = hist[max(0, i - w + 1) : i + 1]
        assert math.isclose(
            out["mov_median"].iloc[i], np.percentile(frame, 50), abs_tol=1e-6
        )


def test_packing_stats_exact_arithmetic(spark, sf_dir):
    out = textstats.packing_stats(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    b = textstats.PACKING_BUDGET
    for _, r in out.iterrows():
        grp = docs[docs["source"] == r["source"]].sort_values("doc_id")
        dls = [len(tokenize_string(t)) for t in grp["text"]]
        total = sum(dls)
        assert r["n_docs"] == len(grp) and r["total_tokens"] == total
        assert r["n_bins"] == math.ceil(total / b)
        off, boundary = 0, 0
        for dl in dls:
            if dl > 0 and (off // b) != ((off + dl - 1) // b):
                boundary += 1
            off += dl
        assert r["n_boundary_docs"] == boundary
    assert out["n_docs"].sum() == len(docs)


def test_terms_lookup_counts_shared_distinct_terms(spark, sf_dir):
    out = fulltext.terms_lookup_query(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values("doc_id")
    lookup = set(tokenize_string(docs["text"].iloc[0]))
    shared = {
        d: len(lookup & set(tokenize_string(t)))
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    # the lookup doc itself shares all its terms and must lead
    assert out["doc_id"].iloc[0] == docs["doc_id"].iloc[0] or (
        out["n_shared"].iloc[0] >= shared[docs["doc_id"].iloc[0]]
    )
    for _, r in out.iterrows():
        assert r["n_shared"] == shared[r["doc_id"]]
    assert (out["n_shared"].diff().dropna() <= 0).all()


def test_runtime_field_matches_stored_fields(spark, sf_dir):
    out = fulltext.runtime_field_query(spark, sf_dir).toPandas()
    base = fulltext.bm25_topk_documents(spark, sf_dir, k=10).toPandas()
    assert list(out["doc_id"]) == list(base["doc_id"])  # same page
    docs = _docs(sf_dir).set_index("doc_id")
    for _, r in out.iterrows():
        txt = docs.loc[r["doc_id"], "text"]
        want = docs.loc[r["doc_id"], "n_chars"] / len(tokenize_string(txt))
        assert math.isclose(r["chars_per_token"], round(want, 6), abs_tol=1e-9)
