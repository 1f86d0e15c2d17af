"""Tests: round-4 session-16 batch 94 — median-of-medians, dense_rank
ties, quantile disc/cont audit."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_median_of_medians_recompute(spark, sf_dir):
    out = parity.median_of_medians_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    buckets = {}
    for d, x in zip(docs.doc_id, docs.n_chars.astype(float)):
        b = (
            int(hashlib.md5(f"{d}:mom".encode()).hexdigest()[:13], 16)
            % parity.MOM_BUCKETS
        )
        buckets.setdefault(b, []).append(x)
    meds = [round(float(np.quantile(v, 0.5)), 6) for v in buckets.values()]
    mom = round(float(np.quantile(meds, 0.5)), 6)
    exact = round(float(np.quantile(docs.n_chars.astype(float), 0.5)), 6)
    assert r.n_buckets == len(buckets)
    assert abs(r.mom - mom) < 1e-6
    assert abs(r.exact_median - exact) < 1e-6
    assert abs(r.rel_err - abs(mom - exact) / exact) < 5e-7


def test_dense_rank_recompute(spark, sf_dir):
    out = parity.dense_rank_ties_page(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    s = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    vals = s.n_chars.values
    rnk = np.zeros(len(s), dtype=int)
    drnk = np.zeros(len(s), dtype=int)
    seen = {}
    dense = 0
    for i, v in enumerate(vals):
        if v not in seen:
            dense += 1
            seen[v] = (i + 1, dense)
        rnk[i], drnk[i] = seen[v]
    assert len(out) == min(50, len(s))
    for r in out.itertuples():
        i = r.rn - 1
        assert r.doc_id == s.doc_id.iloc[i]
        assert r.rnk == rnk[i]
        assert r.drnk == drnk[i]
        assert r.tie_gap == rnk[i] - drnk[i]
    # ties must exist in the page for the gate to mean anything
    assert (out.tie_gap > 0).any()


def test_qdc_recompute(spark, sf_dir):
    out = parity.quantile_disc_cont_audit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    x = np.sort(docs.n_chars.astype(float).values)
    n = len(x)
    assert len(out) == len(parity.QDC_PS)
    for r in out.itertuples():
        disc = x[max(1, math.ceil(r.p * n)) - 1]
        cont = float(np.quantile(x, r.p))
        assert abs(r.q_disc - disc) < 1e-6
        assert abs(r.q_cont - cont) < 1e-5
        assert abs(r.gap - (round(cont, 6) - round(disc, 6))) < 1e-5
