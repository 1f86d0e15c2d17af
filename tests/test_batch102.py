"""Tests: round-4 session-16 batch 102 — posting gap histogram,
pre-purchase dwell, penny rounding."""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity


def test_posting_gap_recompute(spark, sf_dir):
    out = fulltext.posting_gap_histogram(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    post = {}
    for d, t in zip(docs.doc_id, docs.text):
        for tok in set(tokenize_string(t)):
            df, lo, hi = post.get(tok, (0, 10**18, -1))
            post[tok] = (df + 1, min(lo, d), max(hi, d))
    decades = {}
    for df, lo, hi in post.values():
        if df < 2:
            continue
        dec = len(str(df))
        mg = round((hi - lo) / (df - 1), 12)
        n, s = decades.get(dec, (0, 0.0))
        decades[dec] = (n + 1, s + mg)
    assert len(out) == len(decades)
    for r in out.itertuples():
        n, s = decades[r.decade]
        assert r.n_terms == n
        assert abs(r.mean_of_mean_gaps - s / n) < 1e-5
        g = int(
            Decimal(r.mean_of_mean_gaps).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        vb = 1 if r.mean_of_mean_gaps < 1 else (g.bit_length() + 6) // 7
        assert r.varbyte_bytes_per_gap == vb


def test_pre_purchase_dwell_recompute(spark, sf_dir):
    out = parity.pre_purchase_dwell(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="mergesort")
    ev["gap"] = ev.groupby("user_id").us.diff() / 1e6
    p = ev[ev.event_type == "purchase"]
    gaps = p.gap.dropna().values
    assert r.n_purchases == len(p)
    assert r.n_opening == int(p.gap.isna().sum())
    assert abs(r.p50_s - float(np.quantile(gaps, 0.5))) < 1e-4
    assert abs(r.p90_s - float(np.quantile(gaps, 0.9))) < 1e-4
    assert abs(r.max_s - gaps.max()) < 1e-6


def test_penny_rounding_recompute(spark, sf_dir):
    out = parity.penny_rounding_audit(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["c6"] = (
        li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax)
    ).round(6)
    rows = {r.l_returnflag: r for r in out.itertuples()}
    for flag, g in li.groupby("l_returnflag"):
        # per-line 2dp rounding: engines round half-up; replicate exactly
        c2 = [
            Decimal(f"{v:.6f}").quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            for v in g.c6
        ]
        sum_rounded = float(sum(c2))
        rounded_sum = float(
            Decimal(f"{g.c6.sum():.6f}").quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        r = rows[flag]
        assert r.n_lines == len(g)
        assert abs(r.sum_of_rounded - sum_rounded) < 0.02
        assert abs(r.rounded_sum - rounded_sum) < 0.02
        assert (
            abs(
                r.diff_cents
                - round((sum_rounded - rounded_sum) * 100)
            )
            <= 1
        )
