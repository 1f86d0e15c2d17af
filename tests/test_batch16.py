"""Tests: round-3 session-7 batch 10 (ewma / percentiles_bucket /
change_point / rate / categorize_text / frequent_pairs) — invariants
beyond the DuckDB oracle gate."""

from __future__ import annotations

import math
import re
from collections import Counter
from itertools import combinations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _daily_hist(sf_dir: str) -> list[int]:
    days = _events(sf_dir)["ts"].dt.floor("D").dt.date
    counts = days.value_counts()
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    return [int(counts.get(d, 0)) for d in cal]


def test_ewma_matches_sequential_fold(spark, sf_dir):
    out = parity.ewma_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    a = parity.EWMA_ALPHA
    s = None
    exp = []
    for x in hist:
        s = float(x) if s is None else (s * (1 - a)) + (x * a)
        exp.append(s)
    assert list(out["n_events"]) == hist
    for got, want in zip(out["ewma"], exp):
        assert math.isclose(got, want, abs_tol=1e-6)


def test_percentiles_bucket_exact(spark, sf_dir):
    import numpy as np

    out = parity.percentiles_bucket_pipeline(spark, sf_dir).toPandas()
    hist = _daily_hist(sf_dir)
    for _, r in out.iterrows():
        want = np.percentile(hist, r["p"] * 100)  # linear == type 7
        assert math.isclose(r["bucket_value"], want, abs_tol=1e-6)


def test_change_point_is_argmax_deviation(spark, sf_dir):
    out = parity.change_point_agg(spark, sf_dir).toPandas().iloc[0]
    hist = _daily_hist(sf_dir)
    m = sum(hist) / len(hist)
    devs = [abs(x - m) for x in hist]
    assert abs(out["n_events"] - m) == max(devs)
    assert out["change_type"] == ("spike" if out["n_events"] > m else "dip")
    std = math.sqrt(sum((x - m) ** 2 for x in hist) / len(hist))
    assert math.isclose(out["magnitude"], abs(out["n_events"] - m) / std, abs_tol=1e-5)


def test_rate_agg_scales_counts(spark, sf_dir):
    out = parity.rate_agg(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    span = (ev["ts"].dt.date.max() - ev["ts"].dt.date.min()).days + 1
    for _, r in out.iterrows():
        n = (ev["event_type"] == r["event_type"]).sum()
        assert r["n"] == n
        assert math.isclose(r["rate_per_week"], n * 7.0 / span, abs_tol=1e-6)
    assert out["n"].sum() == len(ev)


def test_categorize_text_signatures(spark, sf_dir):
    out = textstats.categorize_text_agg(spark, sf_dir, k=10_000).toPandas()
    docs = _docs(sf_dir)
    sig = Counter(
        " ".join(
            re.sub(r"[0-9]+", "#", t)
            for t in tokenize_string(txt)[: textstats.CATEGORIZE_SIG_TOKENS]
        )
        for txt in docs["text"]
    )
    assert out["n_docs"].sum() == len(docs)
    got = dict(zip(out["category"], out["n_docs"]))
    assert got == dict(sig)


def test_frequent_pairs_support_counts(spark, sf_dir):
    out = textstats.frequent_pairs_agg(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    tok_sets = [set(tokenize_string(t)) for t in docs["text"]]
    df = Counter(t for s in tok_sets for t in s)
    hot = set(
        t
        for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
            : textstats.FREQ_PAIRS_HOT
        ]
    )
    support = Counter(
        pair
        for s in tok_sets
        for pair in combinations(sorted(s & hot), 2)
    )
    ranked = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [((r["term_a"], r["term_b"]), r["support"]) for _, r in out.iterrows()]
    assert got == ranked
