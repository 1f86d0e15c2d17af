"""Tests: round-4 session-18 batch 165 — collisions, A/A, robust means."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_hash_collision_recompute(spark, sf_dir):
    out = parity.hash_collision_audit(spark, sf_dir).toPandas()
    ids = pd.read_parquet(f"{sf_dir}/documents.parquet").doc_id
    n = len(ids)
    for row in out.itertuples():
        hexes = row.bits // 4
        buckets = Counter(
            int(hashlib.md5(f"hc:{i}".encode()).hexdigest()[:hexes], 16)
            for i in ids
        )
        obs = sum(c * (c - 1) // 2 for c in buckets.values())
        assert row.n == n
        assert row.buckets_used == len(buckets)
        assert row.observed_pairs == obs
        assert abs(
            row.expected_pairs - n * (n - 1) / 2 ** (row.bits + 1)
        ) < 1e-4
    # wider hashes collide no more than narrower ones
    srt = out.sort_values("bits")
    assert srt.observed_pairs.is_monotonic_decreasing


def test_aa_calibration_recompute(spark, sf_dir):
    out = parity.aa_test_calibration(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(ed=ev.ts.astype("int64") // 86_400_000_000)
    ud = (
        ev.groupby(["user_id", "ed"])
        .event_type.apply(lambda s: int((s == "purchase").any()))
        .reset_index(name="y")
    )
    assert len(out) == parity.AA_SPLITS
    for row in out.itertuples():
        s = row.split
        arm = ud.user_id.map(
            lambda u: int(
                hashlib.md5(f"aa{s}:{u}".encode()).hexdigest()[:13], 16
            )
            % 2
        )
        n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
        y0 = int(ud.y[arm == 0].sum())
        y1 = int(ud.y[arm == 1].sum())
        assert (row.n0, row.n1) == (n0, n1)
        pp = (y0 + y1) / (n0 + n1)
        z = (y0 / n0 - y1 / n1) / math.sqrt(
            pp * (1 - pp) * (1 / n0 + 1 / n1)
        )
        assert abs(row.z_stat - z) < 1e-5
        assert row.false_positive == int(abs(z) > 1.96)


def test_trimmed_winsorized_recompute(spark, sf_dir):
    out = parity.trimmed_winsorized_means(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = sorted((ev.value * 100).round(0).astype("int64"))
    n = len(cents)
    k = n // 10
    interior = cents[k : n - k]
    trimmed = sum(interior) / (n - 2 * k) / 100
    wins = (
        sum(interior) + k * cents[k] + k * cents[n - k - 1]
    ) / n / 100
    assert (out.n_events, out.k_per_side) == (n, k)
    assert abs(out.raw_mean - sum(cents) / n / 100) < 1e-6
    assert abs(out.trimmed_mean - trimmed) < 1e-6
    assert abs(out.winsorized_mean - wins) < 1e-6
    assert out.clip_low == cents[k] / 100
    assert out.clip_high == cents[n - k - 1] / 100
