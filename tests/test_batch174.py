"""Tests: round-4 session-18 batch 174 — OBF looks, leakage, neg-sampling."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_group_sequential_recompute(spark, sf_dir):
    out = parity.group_sequential_looks(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    u0, u1 = int(us.min()), int(us.max())
    ud = (
        ev.assign(us=us, ed=us // 86_400_000_000)
        .groupby(["user_id", "ed"])
        .agg(
            y=("event_type", lambda s: int((s == "purchase").any())),
            first_us=("us", "min"),
        )
        .reset_index()
    )
    ud["arm"] = ud.user_id.map(
        lambda u: int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16)
        % 2
    )
    assert len(out) == 3
    for row in out.itertuples():
        cutoff = u0 + ((u1 - u0) * row.look) // 3
        sub = ud[ud.first_us <= cutoff]
        n0 = int((sub.arm == 0).sum())
        n1 = int((sub.arm == 1).sum())
        y0 = int(sub.y[sub.arm == 0].sum())
        y1 = int(sub.y[sub.arm == 1].sum())
        assert row.n_units == n0 + n1
        pp = (y0 + y1) / (n0 + n1)
        z = (y0 / n0 - y1 / n1) / math.sqrt(
            pp * (1 - pp) * (1 / n0 + 1 / n1)
        )
        assert abs(row.z_stat - z) < 1e-5
        assert row.obf_bound == parity.OBF_BOUNDS[row.look - 1]
        assert row.crossed == int(abs(z) > row.obf_bound)
    assert out.information_frac.iloc[-1] == 1.0


def test_temporal_leakage_recompute(spark, sf_dir):
    out = parity.temporal_split_leakage(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    cutoff = int(us.min()) + ((int(us.max()) - int(us.min())) * 4) // 5
    train_u = set(ev.user_id[us <= cutoff])
    test = ev[us > cutoff]
    test_u = set(test.user_id)
    seen = test_u & train_u
    assert out.train_users == len(train_u)
    assert out.test_users == len(test_u)
    assert out.seen_test_users == len(seen)
    assert out.test_events == len(test)
    assert out.test_events_seen == int(test.user_id.isin(train_u).sum())
    assert abs(out.user_leakage_frac - len(seen) / len(test_u)) < 1e-6


def test_negative_sampling_recompute(spark, sf_dir):
    out = textstats.negative_sampling_table(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = Counter()
    for txt in docs.text:
        cf.update(tokenize_string(txt))
    ws = {t: round(math.sqrt(c * math.sqrt(c)), 6) for t, c in cf.items()}
    tw = sum(ws.values())
    tc = sum(cf.values())
    for row in out.itertuples():
        assert row.cf == cf[row.term]
        assert abs(row.weight - ws[row.term]) < 1e-9
        assert abs(row.sample_share - ws[row.term] / tw) < 1e-6
        assert abs(row.raw_share - cf[row.term] / tc) < 1e-6
    # damping: the head term's sampled share sits below its raw share
    head = out.iloc[0]
    assert head.sample_share < head.raw_share
    assert abs(out.sample_share.sum() - 1.0) < 1e-3
