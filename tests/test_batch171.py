"""Tests: round-4 session-18 batch 171 — Sobel, Markov removal, layout."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_sobel_recompute(spark, sf_dir):
    out = parity.sobel_mediation_test(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li.l_discount.round(2).to_numpy()
    m = li.l_quantity.round(2).to_numpy()
    y = li.l_extendedprice.round(2).to_numpy()
    n = len(x)
    a, _ = np.polyfit(x, m, 1)
    resid_m = m - np.polyfit(x, m, 1)[1] - a * x
    sa2 = (resid_m**2).sum() / (n - 2) / ((x - x.mean()) ** 2).sum()
    X = np.column_stack([np.ones(n), m, x])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    b, bx = beta[1], beta[2]
    resid_y = y - X @ beta
    cxx = ((x - x.mean()) ** 2).sum()
    cmm = ((m - m.mean()) ** 2).sum()
    cxm = ((x - x.mean()) * (m - m.mean())).sum()
    det = cmm * cxx - cxm * cxm
    sb2 = (resid_y**2).sum() / (n - 3) * cxx / det
    sobel = a * b / math.sqrt(b * b * sa2 + a * a * sb2)
    assert out.n_rows == n
    assert abs(out.path_a - a) < 1e-4
    assert abs(out.path_b - b) < 1e-4
    assert abs(out.direct_c_prime - bx) < 1e-2
    assert abs(out.indirect_ab - a * b) < 1e-3
    assert abs(out.total_c - np.polyfit(x, y, 1)[0]) < 1e-2
    assert abs(out.sobel_z - sobel) < 1e-3
    # decomposition identity: total = direct + indirect
    assert abs(out.total_c - (out.direct_c_prime + out.indirect_ab)) < 1e-3


def test_markov_removal_recompute(spark, sf_dir):
    out = parity.markov_removal_attribution(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = Counter()
    starts = Counter()
    for _, g in ev.groupby("user_id"):
        types = list(g.event_type)
        starts[types[0]] += 1
        for a_, b_ in zip(types, types[1:]):
            trans[(a_, b_)] += 1
    totals = Counter()
    for (s, t), c in trans.items():
        totals[s] += c
    tmat = {(s, t): c / totals[s] for (s, t), c in trans.items()}
    states = sorted(totals)

    def reach3(dead=None):
        mat = {
            k: v
            for k, v in tmat.items()
            if dead is None or (k[0] != dead and k[1] != dead)
        }
        p = {s: mat.get((s, "purchase"), 0.0) for s in states}
        base = dict(p)
        for _ in range(2):
            nxt = {}
            for s in states:
                r = sum(
                    v * p[t]
                    for (ss, t), v in mat.items()
                    if ss == s and t != "purchase" and t in p
                )
                nxt[s] = base.get(s, 0.0) + r
            p = nxt
        return p

    def conv(dead=None):
        p = reach3(dead)
        num = sum(
            w * (0.0 if s == dead else p.get(s, 0.0))
            for s, w in starts.items()
        )
        return num / sum(starts.values())

    base = conv()
    effs = {c: 1 - conv(c) / base for c in parity.MARKOV_CHANNELS}
    te = sum(effs.values())
    for row in out.itertuples():
        assert abs(row.baseline_conv - base) < 1e-5
        assert abs(row.removal_effect - effs[row.channel]) < 1e-5
        assert abs(row.attribution_share - effs[row.channel] / te) < 1e-4
    assert abs(out.attribution_share.sum() - 1.0) < 1e-4


def test_partition_evolution_recompute(spark, sf_dir):
    out = relational.partition_evolution_plan(spark, sf_dir).toPandas().iloc[
        0
    ]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ed = o.o_orderdate.astype("int64") // 86_400_000_000
    month = o.o_orderdate.dt.strftime("%Y-%m")
    day_files = len(set(zip(month, ed)))
    months = month.nunique()
    assert out.n_months == months
    assert out.day_grain_files == day_files
    assert out.month_grain_files == months
    assert out.n_rows == len(o)
    assert abs(out.avg_rows_per_day_file - len(o) / day_files) < 1e-6
    assert (
        abs(out.files_touched_month_query_day_grain - day_files / months)
        < 1e-6
    )
