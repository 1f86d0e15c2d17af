"""Tests: round-4 session-18 batch 157 — Brunner-Munzel, SMOG, ring."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, relational, textstats


def _md5i(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_brunner_munzel_recompute(spark, sf_dir):
    out = parity.brunner_munzel_arms(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    arm = ev.user_id.map(lambda u: _md5i(f"lr:{u}") % 2)
    vals = (ev.value * 100).round(0).astype("int64")
    x = vals[arm == 0].reset_index(drop=True)
    y = vals[arm == 1].reset_index(drop=True)
    nx, ny = len(x), len(y)
    combined = pd.concat([x, y], ignore_index=True).rank(method="average")
    rankcx, rankcy = combined[:nx], combined[nx:]
    sx = (rankcx.to_numpy() - x.rank(method="average").to_numpy()).var(
        ddof=1
    )
    sy = (rankcy.to_numpy() - y.rank(method="average").to_numpy()).var(
        ddof=1
    )
    rybar, rxbar = rankcy.mean(), rankcx.mean()
    w = (
        nx * ny * (rybar - rxbar) / (nx + ny)
        / np.sqrt(nx * sx + ny * sy)
    )
    assert (out.n_x, out.n_y) == (nx, ny)
    assert abs(out.p_hat - (rybar - (ny + 1) / 2) / nx) < 1e-6
    assert abs(out.w_stat - w) < 1e-5


def test_smog_recompute(spark, sf_dir):
    out = textstats.smog_readability(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    words = poly = 0
    for txt in docs.text:
        for t in tokenize_string(txt):
            words += 1
            if len(re.findall(r"[aeiou]+", t)) >= 3:
                poly += 1
    import math

    assert out.n_sentences == len(docs)
    assert out.n_words == words
    assert out.n_polysyllables == poly
    assert abs(out.polysyllable_rate - poly / words) < 1e-6
    want = 1.0430 * math.sqrt(poly * 30 / len(docs)) + 3.1291
    assert abs(out.smog_grade - want) < 1e-5


def test_ring_recompute(spark, sf_dir):
    out = relational.consistent_ring_balance(spark, sf_dir).toPandas()
    keys = pd.read_parquet(f"{sf_dir}/orders.parquet").o_orderkey
    ring = sorted(
        (_md5i(f"ring:{n}:{r}") * 16 + n)
        for n in range(8)
        for r in range(16)
    )
    vhs = [e // 16 for e in ring]
    counts = Counter()
    import bisect

    for k in keys:
        kh = _md5i(f"key:{k}")
        i = bisect.bisect_left(vhs, kh)
        enc = ring[i] if i < len(ring) else ring[0]
        counts[enc % 16] += 1
    for row in out.itertuples():
        assert row.n_keys == counts[row.node]
        assert abs(row.share - counts[row.node] / len(keys)) < 1e-6
    assert out.n_keys.sum() == len(keys)
