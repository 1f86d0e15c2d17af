"""Tests: round-4 session-12 batch 36 (rolling 7-day WAU, conversion
timing, term-df histogram, PIT generation diff) — independent recomputes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def test_rolling_wau_recompute(spark, sf_dir):
    out = parity.rolling_7d_distinct_users(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(day=ev["ts"].dt.normalize())
    days = sorted(ev["day"].unique())
    by_day = ev.groupby("day")["user_id"].agg(set)
    got = dict(zip(out["day"], out["wau"].astype(int)))
    assert len(got) == len(days)
    for d in days:
        lo = d - pd.Timedelta(days=parity.ROLLING_DISTINCT_DAYS - 1)
        users = set()
        for dd in days:
            if lo <= dd <= d:
                users |= by_day[dd]
        assert got[str(pd.Timestamp(d).date())] == len(users)
    # WAU >= DAU everywhere
    dau = ev.groupby("day")["user_id"].nunique()
    for d in days:
        assert got[str(pd.Timestamp(d).date())] >= dau[d]


def test_time_to_convert_recompute(spark, sf_dir):
    out = parity.time_to_convert_stats(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us)
    fa = ev[ev["event_type"] == parity.CONVERT_FROM].groupby("user_id")["us"].min()
    deltas = []
    for uid, ta in fa.items():
        later = ev[
            (ev["user_id"] == uid)
            & (ev["event_type"] == parity.CONVERT_TO)
            & (ev["us"] > ta)
        ]["us"]
        if len(later):
            deltas.append(int(later.min() - ta))
    deltas = np.array(sorted(deltas), dtype=np.int64)
    assert int(out.n_converted) == len(deltas)
    assert abs(out.p50_s - round(float(np.percentile(deltas / 1e6, 50)), 6)) < 1e-6
    assert abs(out.mean_s - round(float(deltas.sum()) / len(deltas) / 1e6, 6)) < 1e-9
    assert abs(out.max_s - round(float(deltas.max()) / 1e6, 6)) < 1e-9


def test_term_df_histogram_recompute(spark, sf_dir):
    out = textstats.term_df_histogram(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    df = {}
    for r in docs.itertuples():
        for t in set(tokenize_string(r.text)):
            df[t] = df.get(t, 0) + 1
    hist = {}
    for c in df.values():
        b = c.bit_length() - 1
        n, s = hist.get(b, (0, 0))
        hist[b] = (n + 1, s + c)
    assert list(out["log2_df"]) == sorted(hist)
    for r in out.itertuples():
        n, s = hist[r.log2_df]
        assert int(r.n_terms) == n and int(r.sum_df) == s
        assert int(r.df_lo) == 1 << int(r.log2_df)
    assert out["n_terms"].sum() == len(df)


def test_generation_diff_recompute(spark, sf_dir):
    out = fulltext.generation_diff_report(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_odd = int((docs["doc_id"] % 2 == 1).sum())
    assert int(out.n_docs) == len(docs)
    assert int(out.n_changed) == n_odd  # stale gen-1 odd copies: +2 tokens
    assert int(out.n_unchanged) == len(docs) - n_odd
    assert int(out.token_delta) == -2 * n_odd
