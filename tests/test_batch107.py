"""Tests: round-4 session-16 batch 107 — serving padding-waste audit."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import textstats


def _ntile(n, k):
    base, extra = divmod(n, k)
    out = []
    for f in range(1, k + 1):
        out += [f] * (base + (1 if f <= extra else 0))
    return out


def test_padding_waste_recompute(spark, sf_dir):
    out = textstats.padding_waste_audit(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs.assign(
        dl=[len(tokenize_string(t)) for t in docs.text]
    )
    B = textstats.PADDING_BATCH
    n_batches = (len(docs) + B - 1) // B
    rows = {r.layout: r for r in out.itertuples()}
    for lname, cols, asc in (
        ("arrival", ["doc_id"], [True]),
        ("length_sorted", ["dl", "doc_id"], [True, True]),
    ):
        s = docs.sort_values(cols, ascending=asc, kind="mergesort")
        s = s.assign(b=_ntile(len(s), n_batches))
        g = s.groupby("b").dl.agg(["size", "max", "sum"])
        waste = int((g["size"] * g["max"] - g["sum"]).sum())
        r = rows[lname]
        assert r.n_batches == n_batches
        assert r.real_tokens == int(docs.dl.sum())
        assert r.padded_slots == waste
        assert abs(
            r.waste_frac - waste / (waste + docs.dl.sum())
        ) < 5e-7
    # length-sorted batching must reclaim real padding
    assert (
        rows["length_sorted"].padded_slots
        < rows["arrival"].padded_slots
    )
