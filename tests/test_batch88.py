"""Tests: round-4 session-16 batch 88 — Neyman allocation, dictionary
encoding audit, join skew report."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import textstats


def test_neyman_recompute(spark, sf_dir):
    out = textstats.neyman_allocation_plan(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    g = docs.groupby(["lang", "source"]).n_chars.agg(
        ["count", "sum", lambda x: (x.astype("int64") ** 2).sum()]
    )
    g.columns = ["n", "sx", "sxx"]
    rows = []
    for (lang, src), r in g.iterrows():
        if r.n > 1:
            m = r.sx / r.n
            s = math.sqrt((r.sxx - r.n * m * m) / (r.n - 1))
        else:
            s = 0.0
        rows.append((lang, src, int(r.n), round(s, 6)))
    w = {(la, so): round(n * round(s, 6), 6) for la, so, n, s in rows}
    wt = sum(w.values())
    raw = {
        k: textstats.NEYMAN_BUDGET * v / wt for k, v in w.items()
    }
    base = {k: math.floor(v) for k, v in raw.items()}
    extra = textstats.NEYMAN_BUDGET - sum(base.values())
    rem = sorted(
        raw,
        key=lambda k: (-round(raw[k] - base[k], 12), k[0], k[1]),
    )
    alloc = dict(base)
    for k in rem[:extra]:
        alloc[k] += 1
    got = {
        (r.lang, r.source): r for r in out.itertuples()
    }
    assert set(got) == set(alloc)
    for k, a in alloc.items():
        assert got[k].allocated == a
    # the apportionment invariant: allocations sum to the exact budget
    assert out.allocated.sum() == textstats.NEYMAN_BUDGET


def test_dict_audit_recompute(spark, sf_dir):
    out = textstats.dict_encoding_audit(spark, sf_dir).toPandas()
    assert len(out) == len(textstats.DICT_AUDIT_COLS)
    for tbl, col in textstats.DICT_AUDIT_COLS:
        df = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        v = df[col].astype(str)
        r = out[(out.tbl == tbl) & (out.col == col)].iloc[0]
        nd = v.nunique()
        bits = 1 if nd <= 2 else (nd - 1).bit_length()
        plain = int(v.str.len().sum())
        dict_payload = int(
            pd.Series(sorted(v.unique())).str.len().sum()
        )
        dict_bytes = dict_payload + (len(v) * bits + 7) // 8
        assert r.n_rows == len(v)
        assert r.n_distinct == nd
        assert r.plain_bytes == plain
        assert r.index_bits == bits
        assert r.dict_bytes == dict_bytes
        assert abs(r.compression_ratio - dict_bytes / plain) < 5e-7
    # low-cardinality strings must compress hard
    assert (out.compression_ratio < 0.5).all()


def test_join_skew_recompute(spark, sf_dir):
    out = textstats.join_skew_report(spark, sf_dir).toPandas()
    assert len(out) == len(textstats.JOIN_SKEW_KEYS)
    for tbl, key in textstats.JOIN_SKEW_KEYS:
        df = pd.read_parquet(f"{sf_dir}/{tbl}.parquet")
        c = df[key].value_counts().values.astype(float)
        r = out[(out.tbl == tbl) & (out.key == key)].iloc[0]
        assert r.n_keys == len(c)
        assert r.n_rows == int(c.sum())
        assert r.max_group == int(c.max())
        assert abs(r.p50_group - float(np.quantile(c, 0.5))) < 1e-6
        assert abs(r.p99_group - float(np.quantile(c, 0.99))) < 1e-4
        assert abs(r.max_key_share - c.max() / c.sum()) < 5e-7
        assert abs(r.skew_factor - c.max() / c.mean()) < 1e-4
