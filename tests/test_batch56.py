"""Tests: round-4 session-15 batch 56 — independent recomputes of
Cramér's V, the two-proportion z-test, hourly chi² goodness-of-fit,
the Theil inequality index, and the dup-cluster source-mix histogram."""

from __future__ import annotations

import math
from datetime import date

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import curation, parity, textstats


def test_cramers_v_recompute(spark, sf_dir):
    out = textstats.cramers_v_lang_source(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = docs.groupby(["source", "lang"]).size()
    rows = docs.groupby("source").size()
    cols = docs.groupby("lang").size()
    n = len(docs)
    chi2 = 0.0
    for (s, l) in sorted(cells.index):
        e = rows[s] * cols[l] / n
        chi2 += (cells[(s, l)] - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(rows), len(cols)) - 1)))
    row = out.iloc[0]
    assert row["n"] == n
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-6
    assert row["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert abs(row["cramers_v"] - round(v, 6)) < 1e-6
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_two_proportion_z_recompute(spark, sf_dir):
    out = parity.two_proportion_z_test(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    anchor = date(2024, 1, 1).toordinal()
    dow = ev["ts"].dt.date.map(lambda d: (d.toordinal() - anchor) % 7)
    is_wknd = dow >= 5
    is_succ = ev["event_type"] == "purchase"
    n1, x1 = int(is_wknd.sum()), int((is_wknd & is_succ).sum())
    n2, x2 = int((~is_wknd).sum()), int((~is_wknd & is_succ).sum())
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    row = out.iloc[0]
    assert (row["n_weekend"], row["x_weekend"]) == (n1, x1)
    assert (row["n_weekday"], row["x_weekday"]) == (n2, x2)
    assert abs(row["z"] - round(z, 6)) < 1e-9
    assert row["significant"] == (abs(z) > parity.Z_CRIT_95)


def test_chi2_hourly_recompute(spark, sf_dir):
    out = parity.chi2_hourly_uniformity(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].values.astype("datetime64[us]").astype("int64")
    hours = (us // 3_600_000_000) % 24
    counts = {h: 0 for h in range(24)}
    for h in hours:
        counts[int(h)] += 1
    n = len(ev)
    e = n / 24.0
    chi2 = sum((counts[h] - e) ** 2 / e for h in range(24))
    row = out.iloc[0]
    assert row["n"] == n
    assert row["n_cells"] == 24 and row["dof"] == 23
    assert abs(row["chi2"] - round(chi2, 6)) < 1e-6


def test_theil_index_recompute(spark, sf_dir):
    out = textstats.theil_index_by_source(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per: dict[str, list[int]] = {}
    for r in docs.itertuples():
        dl = len(tokenize_string(r.text))
        if dl > 0:
            per.setdefault(r.source, []).append(dl)
    for row in out.itertuples(index=False):
        xs = per[row.source]
        mu = sum(xs) / len(xs)
        t = sum(round((x / mu) * math.log(x / mu), 12) for x in xs) / len(xs)
        assert row.n_docs == len(xs)
        assert abs(row.mean_dl - round(mu, 6)) < 1e-9
        assert abs(row.theil_t - round(t, 6)) < 1e-6
        # Theil T is non-negative and bounded by ln(n)
        assert -1e-9 <= row.theil_t <= math.log(len(xs)) + 1e-9


def test_dup_cluster_source_mix_consistent(spark, sf_dir):
    out = curation.dup_cluster_source_mix(spark, sf_dir).toPandas()
    comp = curation.near_dup_components(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source"]]
    j = comp.merge(docs, on="doc_id")
    per = j.groupby("component").agg(
        n_members=("doc_id", "size"), n_sources=("source", "nunique")
    )
    hist = per.groupby("n_sources").agg(
        n_clusters=("n_members", "size"), n_docs=("n_members", "sum")
    )
    assert list(out["n_sources"]) == sorted(hist.index)
    for row in out.itertuples(index=False):
        assert row.n_clusters == hist.loc[row.n_sources, "n_clusters"]
        assert row.n_docs == hist.loc[row.n_sources, "n_docs"]
    # totals reconcile with the component table
    assert out["n_docs"].sum() == len(comp)
