"""Tests: round-4 session-14 batch 62 — Holt-Winters moving_fn, order
latency percentiles, cosine pair histogram, Coleman-Liau."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, similarity, textstats


def _r6(v: float) -> float:
    # halvings yield exact dyadic rationals that can sit ON the 6dp tie;
    # the engines round half-up (away from zero), Python round() is
    # banker's — mirror the engines (the charge-style-trap rule)
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def test_holt_winters_recompute(spark, sf_dir):
    out = parity.holt_winters_pipeline(spark, sf_dir).toPandas()
    hist = parity.date_histogram_facets(spark, sf_dir).toPandas()
    xs = list(hist.sort_values("day").n_events.astype(float))
    m = parity.HW_SEASON
    level, trend = xs[0], 0.0
    season = [0.0] * m
    want = [(_r6(level), _r6(trend), _r6(season[-1]))]
    for x in xs[1:]:
        sm = season[0]
        lp = 0.5 * (x - sm) + 0.5 * (level + trend)
        tp = 0.5 * (lp - level) + 0.5 * trend
        sp = 0.5 * (x - lp) + 0.5 * sm
        season = season[1:] + [sp]
        level, trend = lp, tp
        want.append((_r6(level), _r6(trend), _r6(sp)))
    got = list(
        zip(out.level.tolist(), out.trend.tolist(), out.season.tolist())
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert abs(a - b) < 1e-9


def test_latency_percentiles_recompute(spark, sf_dir):
    out = parity.lineitem_latency_percentiles(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(
        orders[["o_orderkey", "o_orderpriority", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j["lat"] = (
        j.l_shipdate.dt.normalize() - j.o_orderdate.dt.normalize()
    ).dt.days
    for row in out.itertuples(index=False):
        g = j[j.o_orderpriority == row.o_orderpriority].lat
        assert row.n_lines == len(g)
        # numpy 'linear' == type-7 == Spark percentile()
        assert abs(row.p50 - round(float(np.percentile(g, 50)), 6)) < 1e-9
        assert abs(row.p90 - round(float(np.percentile(g, 90)), 6)) < 1e-9
        assert abs(row.p99 - round(float(np.percentile(g, 99)), 6)) < 1e-9


def test_cosine_pair_histogram_recompute(spark, sf_dir):
    out = parity.load(spark, sf_dir, "embeddings")  # noqa: F841 (schema touch)
    got = similarity.cosine_pair_histogram(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    n = len(vecs)
    mult = similarity.PAIR_HASH_MULT % n
    bins: dict[int, int] = {}
    for i, v in vecs.items():
        j = ((i % n) * mult) % n
        if j == i or j not in vecs:
            continue
        a, b = v, vecs[j]
        # sequential ascending-dim folds like the engine
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        c = -2.0 if na == 0 or nb == 0 else dot / (math.sqrt(na) * math.sqrt(nb))
        bn = math.floor(round(c, 6) * 10.0)
        bins[bn] = bins.get(bn, 0) + 1
    assert dict(zip(got.bin, got.n_pairs)) == bins
    assert got.n_pairs.sum() == sum(bins.values())


def test_coleman_liau_recompute(spark, sf_dir):
    out = textstats.coleman_liau_index(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per: dict[str, list] = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        if not ts:
            continue
        letters = sum(1 for ch in r.text if ch.isalpha() and ch.isascii())
        sents = max(1, sum(1 for ch in r.text if ch in ".!?"))
        cli = (
            0.0588 * (100.0 * letters / len(ts))
            - 0.296 * (100.0 * sents / len(ts))
            - 15.8
        )
        per.setdefault(r.source, []).append(round(cli, 12))
    for row in out.itertuples(index=False):
        vals = per[row.source]
        assert row.n_docs == len(vals)
        assert abs(row.avg_cli - round(sum(vals) / len(vals), 6)) < 1e-6
