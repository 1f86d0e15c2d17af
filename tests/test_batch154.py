"""Tests: round-4 session-18 batch 154 — Croston, Wilcoxon, Cox-Stuart."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_croston_recompute(spark, sf_dir):
    out = parity.croston_intermittent_demand(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    pk = li.l_partkey.min()
    sub = li[li.l_partkey == pk]
    ed = sub.l_shipdate.astype("int64") // 86_400_000_000
    daily = sub.groupby(ed).l_quantity.sum().sort_index()
    days = list(daily.index)
    qs = list(daily.values)
    z, p = qs[0], 1.0
    for j in range(1, len(qs)):
        z = (z + qs[j]) / 2
        p = (p + (days[j] - days[j - 1])) / 2
    assert out.part_key == pk
    assert out.n_demand_days == len(qs)
    assert abs(out.total_qty - sum(qs)) < 1e-6
    assert abs(out.z_final - z) < 1e-6
    assert abs(out.p_final - p) < 1e-6
    assert abs(out.croston_forecast - z / p) < 1e-6
    assert abs(out.sba_forecast - 0.75 * z / p) < 1e-6


def test_wilcoxon_recompute(spark, sf_dir):
    out = parity.wilcoxon_signed_rank(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    mid = (us.min() + us.max()) // 2
    x = us[us < mid].groupby(ev.user_id).size()
    y = us[us >= mid].groupby(ev.user_id).size()
    users = set(x.index) | set(y.index)
    diffs = [int(y.get(u, 0)) - int(x.get(u, 0)) for u in users]
    diffs = [d for d in diffs if d != 0]
    n = len(diffs)
    # midranks of |d|
    cnt = Counter(abs(d) for d in diffs)
    lo, mids = 0, {}
    for v in sorted(cnt):
        mids[v] = lo + (cnt[v] + 1) / 2
        lo += cnt[v]
    w_plus = sum(mids[abs(d)] for d in diffs if d > 0)
    t3 = sum(c**3 - c for c in cnt.values())
    z = (2 * 2 * w_plus - 2 * n * (n + 1) / 2) / math.sqrt(
        (2 * n * (n + 1) * (2 * n + 1) - t3) / 3
    )
    # engine z: (2*W2 - n(n+1)) / sqrt((2n(n+1)(2n+1)-t3)/3), W2 = 2*w_plus
    assert out.n_pairs == n
    assert abs(out.w_plus - w_plus) < 1e-9
    assert out.tie_term == t3
    assert abs(out.z_stat - z) < 1e-6


def test_cox_stuart_recompute(spark, sf_dir):
    out = parity.cox_stuart_trend(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    y = list(ed.value_counts().reindex(cal, fill_value=0).sort_index())
    nn = len(y)
    m = nn // 2
    sp = sum(1 for i in range(m) if y[i + m] > y[i])
    sm = sum(1 for i in range(m) if y[i + m] < y[i])
    n = sp + sm
    assert out.n_days == nn
    assert (out.s_plus, out.s_minus, out.n_pairs_used) == (sp, sm, n)
    assert abs(out.z_stat - (2 * sp - n) / math.sqrt(n)) < 1e-6
