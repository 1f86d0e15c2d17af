"""Tests: round-4 session-15 batch 54 — independent recomputes of the
event-analytics pack (Markov transitions, onboarding paths, session gap
sweep, last-touch attribution, Mann-Kendall) and ARI readability."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _events(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    return ev


def test_event_transition_matrix_recompute(spark, sf_dir):
    out = parity.event_transition_matrix(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    pairs: dict[tuple[str, str], int] = {}
    for _uid, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _b), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
    want = sorted(
        (a, b, n, round(n / tot[a], 6)) for (a, b), n in pairs.items()
    )
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want
    # rows of the transition matrix sum to ~1
    sums = out.groupby("from_type")["prob"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_top_event_paths_recompute(spark, sf_dir):
    out = parity.top_event_paths(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    paths: dict[str, int] = {}
    for _uid, g in ev.groupby("user_id"):
        p = ">".join(list(g["event_type"])[: parity.PATH_DEPTH])
        paths[p] = paths.get(p, 0) + 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[
        : parity.PATH_TOPK
    ]
    assert list(out["path"]) == [p for p, _n in want]
    assert list(out["n_users"]) == [n for _p, n in want]


def test_session_gap_sweep_monotone(spark, sf_dir):
    out = parity.session_gap_sweep(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    us = ev["ts"].values.astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us)
    for row in out.itertuples(index=False):
        n_sessions = 0
        for _uid, g in ev.groupby("user_id"):
            gaps = g["us"].diff()
            n_sessions += 1 + int(
                (gaps.dropna() >= row.gap_s * 1_000_000).sum()
            )
        assert row.n_sessions == n_sessions
        assert abs(row.events_per_session - round(len(ev) / n_sessions, 6)) < 1e-9
    # larger gap threshold => fewer or equal sessions
    assert list(out["n_sessions"]) == sorted(out["n_sessions"], reverse=True)


def test_attribution_last_touch_recompute(spark, sf_dir):
    out = parity.attribution_last_touch(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    conv = parity.ATTR_CONVERSION
    counts: dict[str, int] = {}
    for _uid, g in ev.groupby("user_id"):
        last_touch = None
        for t in g["event_type"]:
            if t == conv:
                ch = last_touch or "(none)"
                counts[ch] = counts.get(ch, 0) + 1
            else:
                last_touch = t
    tot = sum(counts.values())
    want = sorted(
        (ch, n, round(n / tot, 6)) for ch, n in counts.items()
    )
    assert [tuple(r) for r in out.itertuples(index=False)] == want
    # conversions never attribute to the conversion type itself
    assert conv not in set(out["channel"])


def test_mann_kendall_recompute(spark, sf_dir):
    out = parity.mann_kendall_trend(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.strftime("%Y-%m-%d")).size()
    cs = list(daily)
    n = len(cs)
    s = sum(
        (cs[j] > cs[i]) - (cs[j] < cs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for c in cs:
        ties[c] = ties.get(c, 0) + 1
    tie_num = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_num = n * (n - 1) * (2 * n + 5) - tie_num
    if s > 0:
        z = (s - 1) / math.sqrt(var_num / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_num / 18.0)
    else:
        z = 0.0
    row = out.iloc[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var_num18"] == var_num
    assert abs(row["z"] - round(z, 6)) < 1e-9
    want_trend = (
        "increasing" if z > parity.MK_Z_CRIT
        else "decreasing" if z < -parity.MK_Z_CRIT
        else "no_trend"
    )
    assert row["trend"] == want_trend


def test_ari_readability_recompute(spark, sf_dir):
    out = textstats.ari_readability(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per: dict[str, list[float]] = {}
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        if not toks:
            continue
        chars = len(r.text.replace(" ", ""))
        words = len(toks)
        sents = max(1, sum(r.text.count(c) for c in ".!?"))
        ari = 4.71 * (chars / words) + 0.5 * (words / sents) - 21.43
        per.setdefault(r.source, []).append(round(ari, 12))
    for row in out.itertuples(index=False):
        vals = per[row.source]
        assert row.n_docs == len(vals)
        assert abs(row.avg_ari - round(sum(vals) / len(vals), 6)) < 1e-6
    assert set(out["source"]) == set(per)
