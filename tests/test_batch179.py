"""Tests: round-4 session-18 batch 179 — DEFF, Gries DP, sortedness."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def test_design_effect_recompute(spark, sf_dir):
    out = parity.design_effect_cluster(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    ud = (
        ev.assign(ed=ed)
        .groupby(["user_id", "ed"])
        .event_type.apply(lambda s: int((s == "purchase").any()))
        .reset_index(name="y")
    )
    per = ud.groupby("user_id").y.agg(["count", "sum"])
    k, n, s = len(per), per["count"].sum(), per["sum"].sum()
    cf = s * s / n
    sst = s - cf
    ssb = (per["sum"] ** 2 / per["count"]).sum() - cf
    ssw = sst - ssb
    msb, msw = ssb / (k - 1), ssw / (n - k)
    m0 = (n - (per["count"] ** 2).sum() / n) / (k - 1)
    rho = (msb - msw) / (msb + (m0 - 1) * msw)
    mbar = n / k
    deff = 1 + (mbar - 1) * rho
    assert (out.n_clusters, out.n_units) == (k, n)
    assert abs(out.icc_rho - rho) < 1e-5
    assert abs(out.design_effect - deff) < 1e-5
    assert abs(out.effective_n - n / deff) < 1e-2


def test_gries_dp_recompute(spark, sf_dir):
    out = textstats.gries_dp_dispersion(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per = Counter()
    for r in docs.itertuples():
        for t in tokenize_string(r.text):
            per[(t, r.source)] += 1
    cf = Counter()
    ps = Counter()
    for (t, s), c in per.items():
        cf[t] += c
        ps[s] += c
    tot = sum(ps.values())
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[
        : textstats.GRIES_TOP_K
    ]
    for i, row in enumerate(out.itertuples()):
        term, c = top[i]
        dp = (
            sum(
                abs(per.get((term, s), 0) / c - ps[s] / tot)
                for s in ps
            )
            / 2
        )
        assert row.term == term
        assert row.cf == c
        assert abs(row.gries_dp - dp) < 1e-6
        assert 0 <= row.gries_dp <= 1


def test_sortedness_recompute(spark, sf_dir):
    out = parity.column_runs_sortedness(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").sort_values(
        "o_orderkey"
    )
    ed = (o.o_orderdate.astype("int64") // 86_400_000_000).to_numpy()
    runs = 1 + int((ed[1:] < ed[:-1]).sum())
    n = len(ed)
    assert out.n_rows == n
    assert out.n_runs == runs
    assert abs(out.expected_runs_random - (n + 1) / 2) < 1e-6
    assert abs(out.sortedness - (1 - (runs - 1) / (n - 1))) < 1e-6
