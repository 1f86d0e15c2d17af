"""Tests: round-4 session-16 batch 82 — AMS F2 sketch, k-anonymity,
DP noisy counts."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_ams_f2_recompute(spark, sf_dir):
    out = textstats.ams_f2_sketch_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = {}
    for t in docs.text:
        for tok in tokenize_string(t):
            cf[tok] = cf.get(tok, 0) + 1
    f2 = sum(c * c for c in cf.values())
    assert r.n_terms == len(cf)
    assert r.f2_exact == f2
    sketches = []
    for i in range(textstats.AMS_SKETCHES):
        x = sum(
            c if _md5_52(f"{i}:{t}:ams") % 2 == 0 else -c
            for t, c in cf.items()
        )
        sketches.append(x * x)
    est = sum(sketches) / textstats.AMS_SKETCHES
    assert abs(r.f2_estimate - est) < 1e-3
    assert abs(r.rel_err - abs(est - f2) / f2) < 1e-5


def test_k_anonymity_recompute(spark, sf_dir):
    out = textstats.k_anonymity_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["len_b"] = docs.n_chars // textstats.K_ANON_CHARS_BUCKET
    g = docs.groupby(["lang", "source", "len_b"]).size()
    assert r.n_classes == len(g)
    assert r.k_min == int(g.min())
    below = g[g < textstats.K_ANON_THRESHOLD]
    assert r.classes_below_k == len(below)
    assert r.docs_below_k == int(below.sum())
    assert r.n_docs == len(docs)


def test_dp_noisy_counts_recompute(spark, sf_dir):
    out = textstats.dp_noisy_counts(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    g = docs.groupby("lang").size()
    assert len(out) == len(g)
    for r in out.itertuples():
        assert r.n == int(g[r.lang])
        u = _md5_52(f"{r.lang}:dp") / float(1 << 52)
        half = u - 0.5
        noise = (
            (-1.0 / textstats.DP_EPSILON)
            * (1.0 if half >= 0 else -1.0)
            * math.log(1.0 - 2.0 * abs(half))
        )
        assert abs(r.noise - noise) < 5e-6
        assert abs(r.noisy_n - (r.n + noise)) < 1e-5
    # the mechanism perturbs but must stay within a sane band at eps=1
    assert (abs(out.noise) < 60).all()
