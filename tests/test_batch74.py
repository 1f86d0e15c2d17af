"""Tests: round-4 session-15 batch 74 — EQL sequence match, rank-window
trio, unpivot lang counts."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_eql_sequence_recompute(spark, sf_dir):
    out = parity.eql_sequence_match(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    span = parity.EQL_MAXSPAN_S * 10**6
    exp = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g.event_type == "view"][["event_id", "us"]].values
        clicks = sorted(
            g[g.event_type == "click"][["us", "event_id"]].values.tolist()
        )
        purch = sorted(
            g[g.event_type == "purchase"][["us", "event_id"]].values.tolist()
        )
        best = None
        for v_id, v_us in views:
            c = next(((cu, ci) for cu, ci in clicks if cu > v_us), None)
            if c is None:
                continue
            p = next(((pu, pi) for pu, pi in purch if pu > c[0]), None)
            if p is None or p[0] - v_us > span:
                continue
            tup = (v_us, v_id, c[1], c[0], p[1], p[0])
            if best is None or tup < best:
                best = tup
        if best is not None:
            exp[uid] = best
    assert len(out) == len(exp)
    for r in out.itertuples():
        v_us, v_id, c_id, c_us, p_id, p_us = exp[r.user_id]
        assert (r.v_id, r.c_id, r.p_id) == (v_id, c_id, p_id)
        assert r.v_us == v_us and r.span_us == p_us - v_us


def test_window_rank_recompute(spark, sf_dir):
    out = parity.window_rank_functions(spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["tp"] = (orders.o_totalprice.round(2) * 100).round().astype(
        "int64"
    )
    spend = orders.groupby("o_custkey").tp.sum().reset_index()
    spend = spend.sort_values(
        ["tp", "o_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(spend)
    assert len(out) == min(100, n)
    base, extra = divmod(n, 10)
    # cumulative bucket ends for ntile(10)
    ends = np.cumsum([base + (1 if i < extra else 0) for i in range(10)])
    for r in out.itertuples():
        i = r.rank - 1
        assert r.o_custkey == spend.o_custkey.iloc[i]
        assert abs(r.spend - spend.tp.iloc[i] / 100.0) < 5e-3
        assert abs(r.pct_rank - (0.0 if n == 1 else i / (n - 1))) < 5e-7
        assert abs(r.cume_dist - (i + 1) / n) < 5e-7
        assert r.decile == int(np.searchsorted(ends, i + 1)) + 1


def test_unpivot_lang_recompute(spark, sf_dir):
    out = parity.unpivot_lang_counts(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sources = sorted(docs.source.unique())
    # lossless melt: every (source, pinned lang) cell present, zeros kept
    assert len(out) == len(sources) * len(parity.UNPIVOT_LANGS)
    cnt = docs.groupby(["source", "lang"]).size()
    for r in out.itertuples():
        assert r.lang in parity.UNPIVOT_LANGS
        assert r.n_docs == cnt.get((r.source, r.lang), 0)
    # pinned list excludes zh by design; totals cover everything else
    in_list = docs[docs.lang.isin(parity.UNPIVOT_LANGS)]
    assert out.n_docs.sum() == len(in_list)
