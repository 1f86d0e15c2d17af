"""Tests: round-4 session-16 batch 86 — decompounder, date-math range,
set operations."""

from __future__ import annotations

import hashlib

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext


def test_compound_split_recompute(spark, sf_dir):
    out = fulltext.compound_split_suggest(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cf = {}
    for t in docs.text:
        for tok in tokenize_string(t):
            cf[tok] = cf.get(tok, 0) + 1
    exp = []
    for inp in fulltext.COMPOUND_INPUTS:
        cands = []
        for i in range(1, len(inp)):
            lft, rgt = inp[:i], inp[i:]
            if lft in cf and rgt in cf:
                cands.append((inp, lft, rgt, cf[lft], cf[rgt],
                              cf[lft] * cf[rgt]))
        cands.sort(key=lambda c: (-c[5], c[1]))
        for r, c in enumerate(cands, 1):
            exp.append(c + (r,))
    assert len(out) == len(exp)
    for r, c in zip(out.itertuples(), sorted(exp, key=lambda c: (c[0], c[6]))):
        assert (r.input, r.lft, r.rgt, r.score, r.rank) == (
            c[0], c[1], c[2], c[5], c[6],
        )
    # the no-split probe must yield nothing; real compounds must split
    assert "xqzzy" not in set(out.input)
    assert "tablescan" in set(out.input)


def test_date_math_recompute(spark, sf_dir):
    out = fulltext.date_math_range_query(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    now = us.max()
    lo = now - fulltext.DATE_MATH_DAYS * 86400000000
    hit = ev[(us >= lo) & (us <= now)]
    assert r.n_hits == len(hit)
    assert r.first_id == hit.event_id.min()
    assert r.last_id == hit.event_id.max()
    ids = sorted(str(i) for i in hit.event_id)
    assert r.witness == hashlib.md5(",".join(ids).encode()).hexdigest()


def test_set_ops_recompute(spark, sf_dir):
    out = fulltext.set_operations_users(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = set(ev[ev.event_type == "view"].user_id)
    p = set(ev[ev.event_type == "purchase"].user_id)
    e = set(ev[ev.event_type == "error"].user_id)
    exp = {
        "view_intersect_purchase": v & p,
        "view_except_purchase": v - p,
        "view_union_error": v | e,
    }
    rows = {r.op: r for r in out.itertuples()}
    assert set(rows) == set(exp)
    for name, ids in exp.items():
        r = rows[name]
        assert r.n_users == len(ids)
        w = hashlib.md5(
            ",".join(sorted(str(i) for i in ids)).encode()
        ).hexdigest()
        assert r.witness == w
