"""Tests: round-4 session-11 batch 26 (Heaps'-law fit, tokens/byte,
terms-ordered-by-metric, daily distinct users) — independent recomputes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_heaps_fit_recompute(spark, sf_dir):
    out = textstats.heaps_law_fit(spark, sf_dir).toPandas()
    docs = _docs(sf_dir).sort_values("doc_id")
    seen: set[str] = set()
    cum_t, xs, ys = 0, [], []
    for t in docs["text"]:
        toks = tokenize_string(t)
        cum_t += len(toks)
        seen.update(toks)
        if cum_t > 0 and seen:
            xs.append(round(math.log(cum_t), 6))
            ys.append(round(math.log(len(seen)), 6))
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    row = out.iloc[0]
    assert int(row.n) == len(xs)
    assert abs(row.beta - slope) < 1e-5
    assert abs(row.intercept - intercept) < 1e-5
    assert abs(row.r2 - r * r) < 1e-5
    assert 0.0 <= row.beta <= 1.0  # vocabulary can't grow faster than tokens


def test_tokens_per_byte_recompute(spark, sf_dir):
    out = (
        textstats.tokens_per_byte_by_source(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    docs = _docs(sf_dir)
    for src, grp in docs.groupby("source"):
        nt = sum(len(tokenize_string(t)) for t in grp["text"])
        nb = int(grp["n_chars"].sum())
        row = out.loc[src]
        assert (int(row.n_docs), int(row.n_tokens), int(row.n_bytes)) == (
            len(grp),
            nt,
            nb,
        )
        assert abs(row.tokens_per_byte - round(nt / nb, 6)) < 1e-9
        assert abs(row.bytes_per_token - round(nb / nt, 6)) < 1e-9


def test_terms_order_by_metric_recompute(spark, sf_dir):
    out = parity.terms_order_by_metric(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    want = []
    for et, grp in ev.groupby("event_type"):
        vsum = sum(round(v, 6) for v in grp["value"])  # decimal-exact at 6dp
        want.append((et, len(grp), round(vsum / len(grp), 6)))
    want.sort(key=lambda t: (-t[2], t[0]))
    got = list(
        zip(out["event_type"], out["n_events"].astype(int), out["mean_value"])
    )
    assert [g[:2] for g in got] == [w[:2] for w in want]
    assert all(abs(g[2] - w[2]) < 1e-6 for g, w in zip(got, want))
    assert list(out["rank"]) == list(range(1, len(want) + 1))


def test_daily_distinct_users_recompute(spark, sf_dir):
    out = parity.daily_distinct_users(spark, sf_dir).toPandas().set_index("day")
    ev = _events(sf_dir)
    ev = ev.assign(day=ev["ts"].dt.strftime("%Y-%m-%d"))
    for day, grp in ev.groupby("day"):
        row = out.loc[day]
        assert int(row.n_events) == len(grp)
        assert int(row.n_users) == grp["user_id"].nunique()
    assert len(out) == ev["day"].nunique()
