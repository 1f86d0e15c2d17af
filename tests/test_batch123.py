"""Tests: round-4 session-17 batch 123 — Jonckheere-Terpstra, Grubbs,
Mood's median."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_jonckheere_recompute(spark, sf_dir):
    out = relational.jonckheere_terpstra(spark, sf_dir).toPandas().iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sz = li.groupby("l_orderkey").size()
    df = orders[["o_orderkey", "o_orderpriority"]].copy()
    df["v"] = df.o_orderkey.map(sz)
    df = df.dropna(subset=["v"])
    groups = sorted(df.o_orderpriority.unique())
    vals = {g: sorted(df[df.o_orderpriority == g].v.astype(int)) for g in groups}
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            ca, cb = Counter(vals[groups[i]]), Counter(vals[groups[j]])
            for va, na in ca.items():
                for vb, nb in cb.items():
                    if va < vb:
                        jt2 += 2 * na * nb
                    elif va == vb:
                        jt2 += na * nb
    n_g = [len(vals[g]) for g in groups]
    n = sum(n_g)
    e = (n * n - sum(x * x for x in n_g)) / 4.0
    var = (
        n * n * (2 * n + 3) - sum(x * x * (2 * x + 3) for x in n_g)
    ) / 72.0
    assert (out.n_groups, out.n_total, out.jt2) == (len(groups), n, jt2)
    assert abs(out.e_jt - e) < 1e-6
    assert abs(out.z_stat - (jt2 / 2.0 - e) / math.sqrt(var)) < 1e-6


def test_grubbs_recompute(spark, sf_dir):
    out = parity.grubbs_outlier_day(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index()
    n = len(y)
    mean = y.mean()
    sd = y.std(ddof=1)
    g = ((y - mean).abs() / sd).round(6)
    best = sorted(
        zip(-g.values, [d.strftime("%Y-%m-%d") for d in g.index])
    )[0]
    assert out.n_days == n
    assert abs(out.mean_events - mean) < 1e-6
    assert abs(out.sd_events - sd) < 1e-5
    assert out.outlier_day == best[1]
    assert abs(out.g_stat - (-best[0])) < 1e-6
    assert out.is_outlier == int(out.g_stat > parity.GRUBBS_CRIT)
    # G is bounded by (n-1)/sqrt(n)
    assert out.g_stat <= (n - 1) / math.sqrt(n) + 1e-9


def test_mood_median_recompute(spark, sf_dir):
    out = parity.mood_median_test(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    med = float(np.percentile(ev.value, 50))
    kept = ev[ev.value != med]
    types = sorted(kept.event_type.unique())
    cells = {
        t: (
            int((kept[kept.event_type == t].value > med).sum()),
            int((kept[kept.event_type == t].value < med).sum()),
        )
        for t in types
    }
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    chi2 = 0.0
    for t in types:
        a, b = cells[t]
        rn = a + b
        ea, eb = rn * ta / (ta + tb), rn * tb / (ta + tb)
        chi2 += round((a - ea) ** 2 / ea + (b - eb) ** 2 / eb, 12)
    assert list(out.event_type) == types
    for r in out.itertuples():
        assert (r.n_above, r.n_below) == cells[r.event_type]
        assert r.k == len(types) and r.df == len(types) - 1
        assert abs(r.chi2_stat - chi2) < 1e-6
    # medians split roughly evenly overall
    assert abs(ta - tb) <= len(kept) // 10
