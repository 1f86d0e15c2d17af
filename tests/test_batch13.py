"""Tests: round-3 session-7 batch 7 (serial diff / bucket extrema /
bucket script / bucket sort / normalize / top metrics / t-test /
extended stats / boxplot / MAD / matrix stats / filters agg) —
invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _daily_hist(sf_dir: str) -> pd.Series:
    days = _events(sf_dir)["ts"].dt.floor("D").dt.date
    counts = days.value_counts()
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    return pd.Series([counts.get(d, 0) for d in cal], index=cal)


# ---------------------------------------------------------------- pipelines
def test_serial_diff_matches_lagged_difference(spark, sf_dir):
    out = parity.serial_diff_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    lag = parity.SERIAL_DIFF_LAG
    assert list(out["n_events"]) == list(hist.values)
    exp = hist.values - np.concatenate([hist.values[:lag] * 0 + hist.values[:lag], hist.values[:-lag]])
    # first `lag` entries default to 0 (no lag row exists)
    exp[:lag] = 0
    assert list(out["serial_diff"]) == list(exp)


def test_bucket_extrema_finds_true_extremes(spark, sf_dir):
    out = parity.bucket_extrema_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    mx = out[out["metric"] == "max_bucket"].iloc[0]
    mn = out[out["metric"] == "min_bucket"].iloc[0]
    assert mx["value"] == hist.max() and mn["value"] == hist.min()
    # earliest tied day wins
    assert mx["key"] == str(hist[hist == hist.max()].index[0])
    assert mn["key"] == str(hist[hist == hist.min()].index[0])


def test_bucket_script_ratio_consistent(spark, sf_dir):
    out = parity.bucket_script_pipeline(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    per_day = ev.groupby(ev["ts"].dt.floor("D").dt.date)
    assert list(out["n_events"]) == list(per_day.size())
    for _, r in out.iterrows():
        assert math.isclose(
            r["purchase_per_event"] * r["n_events"],
            r["purchase_sum"],
            rel_tol=0,
            abs_tol=1e-4,
        )


def test_bucket_sort_pages_sorted_buckets(spark, sf_dir):
    out = parity.bucket_sort_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    ordered = sorted(
        hist.items(), key=lambda kv: (-kv[1], str(kv[0]))
    )
    lo, n = parity.BUCKET_SORT_FROM, parity.BUCKET_SORT_SIZE
    exp = ordered[lo : lo + n]
    assert list(out["position"]) == list(range(lo + 1, lo + len(exp) + 1))
    assert [(str(d), c) for d, c in exp] == list(
        zip(out["day"], out["n_events"])
    )


def test_normalize_props_sum_to_one(spark, sf_dir):
    out = parity.normalize_pipeline(spark, sf_dir).toPandas()
    assert math.isclose(out["prop_of_sum"].sum(), 1.0, abs_tol=1e-4)
    total = out["n_events"].sum()
    for _, r in out.iterrows():
        assert math.isclose(
            r["prop_of_sum"], r["n_events"] / total, abs_tol=1e-6
        )


def test_top_metrics_is_latest_event_value(spark, sf_dir):
    out = parity.top_metrics_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    latest = (
        ev.sort_values(["ts", "event_id"], ascending=False)
        .groupby("event_type")
        .first()
    )
    for _, r in out.iterrows():
        assert math.isclose(
            r["latest_value"],
            round(latest.loc[r["event_type"], "value"], 6),
            abs_tol=1e-9,
        )


def test_t_test_matches_manual_welch(spark, sf_dir):
    out = parity.t_test_agg(spark, sf_dir).toPandas().iloc[0]
    ev = _events(sf_dir)
    a, b = parity.T_TEST_GROUPS
    va = ev.loc[ev["event_type"] == a, "value"].round(6).to_numpy()
    vb = ev.loc[ev["event_type"] == b, "value"].round(6).to_numpy()
    t = (va.mean() - vb.mean()) / math.sqrt(
        va.var(ddof=1) / len(va) + vb.var(ddof=1) / len(vb)
    )
    assert out["n1"] == len(va) and out["n2"] == len(vb)
    assert math.isclose(out["t_stat"], t, rel_tol=0, abs_tol=1e-5)


# -------------------------------------------------------------- metric aggs
def test_extended_stats_matches_numpy(spark, sf_dir):
    out = textstats.extended_stats_agg(spark, sf_dir).toPandas().iloc[0]
    x = _docs(sf_dir)["n_chars"].to_numpy(dtype=np.float64)
    assert out["n_docs"] == len(x)
    assert math.isclose(out["variance"], x.var(ddof=0), abs_tol=1e-4)
    assert math.isclose(out["std_deviation"], x.std(ddof=0), abs_tol=1e-4)
    assert math.isclose(
        out["std_upper"], x.mean() + 2 * x.std(ddof=0), abs_tol=1e-4
    )
    assert out["sum_of_squares"] == int((x * x).sum())


def test_boxplot_matches_numpy_quartiles(spark, sf_dir):
    out = textstats.boxplot_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    for _, r in out.iterrows():
        x = docs.loc[docs["lang"] == r["lang"], "n_chars"].to_numpy()
        q1, q2, q3 = np.percentile(x, [25, 50, 75])  # linear == type 7
        assert math.isclose(r["q1"], q1, abs_tol=1e-6)
        assert math.isclose(r["q2"], q2, abs_tol=1e-6)
        assert math.isclose(r["q3"], q3, abs_tol=1e-6)
        assert math.isclose(r["iqr"], q3 - q1, abs_tol=1e-5)
        assert r["min_chars"] == x.min() and r["max_chars"] == x.max()


def test_mad_matches_manual(spark, sf_dir):
    out = textstats.mad_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    for _, r in out.iterrows():
        x = docs.loc[docs["lang"] == r["lang"], "n_chars"].to_numpy()
        med = np.percentile(x, 50)
        mad = np.percentile(np.abs(x - med), 50)
        assert math.isclose(r["median_chars"], med, abs_tol=1e-6)
        assert math.isclose(r["mad"], mad, abs_tol=1e-6)


def test_matrix_stats_matches_numpy(spark, sf_dir):
    out = textstats.matrix_stats_agg(spark, sf_dir).toPandas().iloc[0]
    docs = _docs(sf_dir)
    x = docs["n_chars"].to_numpy(dtype=np.float64)
    y = np.array([len(tokenize_string(t)) for t in docs["text"]], dtype=np.float64)
    assert math.isclose(out["covariance"], np.cov(x, y, ddof=1)[0, 1], abs_tol=1e-3)
    assert math.isclose(out["correlation"], np.corrcoef(x, y)[0, 1], abs_tol=1e-6)


def test_filters_agg_partitions_corpus(spark, sf_dir):
    out = textstats.filters_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    assert out["n_docs"].sum() == len(docs)
    for name, lo, hi in textstats.FILTERS_BUCKETS:
        sel = docs["n_chars"] >= lo
        if hi is not None:
            sel &= docs["n_chars"] < hi
        got = out.loc[out["key"] == name, "n_docs"]
        if sel.sum() == 0:
            assert got.empty
        else:
            assert got.iloc[0] == sel.sum()
            assert math.isclose(
                out.loc[out["key"] == name, "avg_chars"].iloc[0],
                docs.loc[sel, "n_chars"].mean(),
                abs_tol=1e-4,
            )
