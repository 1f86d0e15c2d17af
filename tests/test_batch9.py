"""Tests: round-3 session-5 batch 3 (hit-set histogram / adjacency matrix /
composite paging / funnel / retention cohorts) — invariants beyond the
DuckDB oracle gate."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_histogram_buckets_partition_hits(spark, sf_dir):
    out = fulltext.histogram_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    qts = set(fulltext.BOOLEAN_QUERY.split())
    w = fulltext.HISTOGRAM_WIDTH
    exp = Counter(
        (r.n_chars // w) * w
        for r in docs.itertuples()
        if qts & set(tokenize_string(r.text))
    )
    assert dict(zip(out["bucket"], out["n_docs"])) == dict(exp)
    assert out["n_docs"].sum() == sum(exp.values())
    assert (out["bucket"] % w == 0).all()


def test_adjacency_matrix_counts(spark, sf_dir):
    out = fulltext.adjacency_matrix_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    needs = {
        name: set(tokenize_string(q)) for name, q in fulltext.MATCHED_CLAUSES
    }
    sets = defaultdict(set)
    for r in docs.itertuples():
        ts = set(tokenize_string(r.text))
        for name, need in needs.items():
            if need <= ts:
                sets[name].add(r.doc_id)
    names = sorted(needs)
    exp = {}
    for i, a in enumerate(names):
        if sets[a]:
            exp[a] = len(sets[a])
        for b in names[i + 1 :]:
            n = len(sets[a] & sets[b])
            if n:
                exp[f"{a}&{b}"] = n
    assert dict(zip(out["key"], out["n_docs"])) == exp
    assert any("&" in k for k in out["key"])  # intersections exercised


def test_composite_page_cursor(spark, sf_dir):
    out = fulltext.composite_agg_page(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    counts = docs.groupby(["source", "lang"]).size()
    after = fulltext.COMPOSITE_AFTER
    exp = sorted(k for k in counts.index if tuple(k) > after)[
        : fulltext.COMPOSITE_SIZE
    ]
    assert [(r.source, r.lang) for r in out.itertuples()] == exp
    for r in out.itertuples():
        assert r.n_docs == counts[(r.source, r.lang)]
    # every returned bucket is strictly past the cursor
    assert all((r.source, r.lang) > after for r in out.itertuples())


def test_funnel_monotone_and_exact(spark, sf_dir):
    out = parity.funnel_analysis(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    frontier = None
    exp = []
    for step in parity.FUNNEL_STEPS:
        e = ev[ev["event_type"] == step]
        if frontier is not None:
            e = e.merge(frontier, on="user_id")
            e = e[e["ts"] > e["prev_ts"]]
        frontier = (
            e.groupby("user_id")["ts"].min().rename("prev_ts").reset_index()
        )
        exp.append(len(frontier))
    assert list(out["n_users"]) == exp
    # funnel counts never increase step to step
    assert all(a >= b for a, b in zip(exp, exp[1:]))


def test_retention_cohort_matrix(spark, sf_dir):
    out = parity.retention_cohorts(spark, sf_dir).toPandas()
    ev = _events(sf_dir).copy()
    # Monday-start week truncation, matching Spark date_trunc('week')
    ev["week"] = (
        ev["ts"] - pd.to_timedelta(ev["ts"].dt.weekday, unit="D")
    ).dt.normalize()
    first = ev.groupby("user_id")["week"].min().rename("cohort")
    j = ev.merge(first, on="user_id")
    j["off"] = ((j["week"] - j["cohort"]).dt.days // 7).astype(int)
    j["cohort_str"] = j["cohort"].dt.strftime("%Y-%m-%d")
    exp = j.groupby(["cohort_str", "off"])["user_id"].nunique().to_dict()
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == exp
    # offset 0 of each cohort contains the full cohort population
    pop = first.dt.strftime("%Y-%m-%d").value_counts().to_dict()
    for (cw, off), n in got.items():
        if off == 0:
            assert n == pop[cw]
