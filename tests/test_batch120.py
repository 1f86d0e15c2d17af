"""Tests: round-4 session-17 batch 120 — Hilbert layout plan, corpus
BLEU-2 pairs, Cochran's Q."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import parity, relational, textstats


def _xy2d(n: int, x: int, y: int) -> int:
    """Reference Hilbert xy2d (classic C version, verbatim port)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _ntile(n_rows: int, k: int) -> list[int]:
    """Spark/DuckDB ntile bucket ids for n_rows rows in total order."""
    out = []
    base, extra = divmod(n_rows, k)
    for b in range(1, k + 1):
        out.extend([b] * (base + (1 if b <= extra else 0)))
    return out


def test_hilbert_plan_recompute(spark, sf_dir):
    out = relational.hilbert_layout_plan(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"]
    ]
    nx, ny = int(li.l_partkey.max()) + 1, int(li.l_suppkey.max()) + 1
    xb = relational.ZORDER_X_BUCKETS
    yb = relational.ZORDER_Y_BUCKETS
    li["bx"] = li.l_partkey * xb // nx
    li["by"] = li.l_suppkey * yb // ny
    li["h"] = [
        _xy2d(relational.HILBERT_N, int(x), int(y))
        for x, y in zip(li.bx, li.by)
    ]
    li["z"] = [
        int(
            "".join(
                f"{int(x):04b}"[i] + f"{int(y):04b}"[i] for i in range(4)
            ),
            2,
        )
        for x, y in zip(li.bx, li.by)
    ]
    pb = relational.ZORDER_PRED_BUCKET
    preds = {
        "x_range": (
            "l_partkey",
            nx * pb // xb,
            nx * (pb + 1) // xb - 1,
        ),
        "y_range": (
            "l_suppkey",
            ny * pb // yb,
            ny * (pb + 1) // yb - 1,
        ),
    }
    for layout, key in (("hilbert", "h"), ("zorder", "z")):
        srt = li.sort_values(
            [key, "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"]
        ).reset_index(drop=True)
        srt["f"] = _ntile(len(srt), relational.ZORDER_N_FILES)
        files = srt.groupby("f").agg(
            min_x=("l_partkey", "min"),
            max_x=("l_partkey", "max"),
            min_y=("l_suppkey", "min"),
            max_y=("l_suppkey", "max"),
            n_rows=("l_partkey", "size"),
        )
        for pname, (col, lo, hi) in preds.items():
            mn, mx = ("min_x", "max_x") if col == "l_partkey" else (
                "min_y",
                "max_y",
            )
            hit = (files[mn] <= hi) & (files[mx] >= lo)
            row = out[(out.layout == layout) & (out.predicate == pname)].iloc[0]
            assert row.n_files == len(files)
            assert row.files_read == int(hit.sum())
            assert row.files_skipped == len(files) - int(hit.sum())
            assert row.rows_matched == int(li[col].between(lo, hi).sum())
            assert row.rows_scanned == int(files.n_rows[hit].sum())
    # the hilbert key must be a true Hilbert index: adjacent d cells are
    # grid neighbors (locality, the property Morton lacks)
    cells = {(x, y): _xy2d(16, x, y) for x in range(16) for y in range(16)}
    byd = {d: xy for xy, d in cells.items()}
    assert len(byd) == 256  # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = byd[d], byd[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_corpus_bleu_recompute(spark, sf_dir):
    out = textstats.corpus_bleu_pairs(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c1: dict[str, Counter] = {}
    c2: dict[str, Counter] = {}
    for r in docs.itertuples():
        toks = tokenize_string(r.text)
        c1.setdefault(r.source, Counter()).update(toks)
        c2.setdefault(r.source, Counter()).update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    srcs = sorted(c1)
    expected = []
    for cand in srcs:
        for ref in srcs:
            if cand == ref:
                continue
            m1 = sum(min(c, c1[ref][g]) for g, c in c1[cand].items())
            m2 = sum(min(c, c2[ref][g]) for g, c in c2[cand].items())
            if m1 == 0 or m2 == 0:
                continue
            n1, n2 = sum(c1[cand].values()), sum(c2[cand].values())
            r_toks = sum(c1[ref].values())
            p1, p2 = m1 / n1, m2 / n2
            lb = min(0.0, 1.0 - r_toks / n1) + 0.5 * (
                round(math.log(p1), 12) + round(math.log(p2), 12)
            )
            expected.append((cand, ref, n1, m1, n2, m2, p1, p2, lb))
    assert len(out) == len(expected)
    for row, exp in zip(out.itertuples(), expected):
        assert (row.cand_source, row.ref_source) == exp[:2]
        assert (row.n1_cand, row.match1, row.n2_cand, row.match2) == exp[2:6]
        assert abs(row.p1 - exp[6]) < 1e-6
        assert abs(row.p2 - exp[7]) < 1e-6
        assert abs(row.log_bleu2 - exp[8]) < 1e-6
        # modified precision is a true precision
        assert 0 < row.p1 <= 1 and 0 < row.p2 <= 1


def test_cochran_q_recompute(spark, sf_dir):
    out = parity.cochran_q_test(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev.ts.dt.normalize()
    k = len(parity.COCHRAN_TYPES)
    flags = {}
    for (u, d), grp in ev.groupby(["user_id", "day"]):
        present = set(grp.event_type)
        flags[(u, d)] = [int(t in present) for t in parity.COCHRAN_TYPES]
    c = [sum(v[i] for v in flags.values()) for i in range(k)]
    sr = sum(sum(v) for v in flags.values())
    sr2 = sum(sum(v) ** 2 for v in flags.values())
    q = (k - 1) * (k * sum(x * x for x in c) - sr * sr) / (k * sr - sr2)
    assert out.n_blocks == len(flags)
    for i, t in enumerate(parity.COCHRAN_TYPES):
        assert out[f"c_{t}"] == c[i]
    assert out.df == k - 1
    assert abs(out.q_stat - q) < 1e-6
