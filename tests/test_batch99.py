"""Tests: round-4 session-16 batch 99 — join cardinality audit, char
entropy bound, randomized response."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.operators import relational, textstats


def test_join_cardinality_recompute(spark, sf_dir):
    out = relational.join_cardinality_audit(spark, sf_dir).toPandas()
    rows = {r.pair: r for r in out.itertuples()}
    for name, ta, ka, tb, kb in relational.JOIN_CARD_PAIRS:
        a = pd.read_parquet(f"{sf_dir}/{ta}.parquet")[ka]
        b = pd.read_parquet(f"{sf_dir}/{tb}.parquet")[kb]
        actual = int(
            a.value_counts()
            .to_frame("ca")
            .join(b.value_counts().to_frame("cb"), how="inner")
            .prod(axis=1)
            .sum()
        )
        est = len(a) * len(b) / max(a.nunique(), b.nunique())
        r = rows[name]
        assert (r.na, r.nb) == (len(a), len(b))
        assert (r.da, r.db) == (a.nunique(), b.nunique())
        assert r.n_actual == actual
        assert abs(r.n_estimated - est) < 1e-3
        if actual:
            assert abs(
                r.q_error - max(est / actual, actual / est)
            ) < 1e-4
    # FK joins with perfect NDVs: the model should be near-exact
    assert (out.q_error < 1.2).all()


def test_char_entropy_bound_recompute(spark, sf_dir):
    out = textstats.char_entropy_compression_bound(
        spark, sf_dir
    ).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {r.source: r for r in out.itertuples()}
    for src, g in docs.groupby("source"):
        cnt = {}
        for t in g.text:
            for ch in t:
                cnt[ch] = cnt.get(ch, 0) + 1
        n = sum(cnt.values())
        h = sum(
            round(-(c / n) * math.log(c / n) * 1.4426950408889634, 12)
            for c in cnt.values()
        )
        r = rows[src]
        assert r.raw_chars == n
        assert abs(r.entropy_bits_per_char - h) < 1e-5
        assert r.bound_bytes == math.ceil(h * n / 8.0)
    # a ~27-symbol alphabet: entropy must sit well under 8 bits/char
    assert (out.entropy_bits_per_char < 6).all()
    assert (out.best_ratio < 0.75).all()


def test_randomized_response_recompute(spark, sf_dir):
    out = textstats.randomized_response_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    truth = ev.groupby("user_id").event_type.apply(
        lambda g: int((g == "purchase").any())
    )
    rel = []
    for uid, t in truth.items():
        u = (
            int(hashlib.md5(f"{uid}:rr".encode()).hexdigest()[:13], 16)
            % (1 << 20)
        ) / float(1 << 20)
        rel.append(1 - t if u < textstats.RR_FLIP_P else t)
    n = len(truth)
    p_obs = sum(rel) / n
    est = (p_obs - textstats.RR_FLIP_P) / (1 - 2 * textstats.RR_FLIP_P)
    assert r.n_users == n
    assert abs(r.true_rate - truth.sum() / n) < 5e-7
    assert abs(r.observed_rate - p_obs) < 5e-7
    assert abs(r.estimated_rate - est) < 5e-7
