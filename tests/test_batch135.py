"""Tests: round-4 session-17 batch 135 — rich club, circadian
regularity, ratio-to-MA indices."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def test_rich_club_recompute(spark, sf_dir):
    out = relational.rich_club_coefficient(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_n[(parts[i], parts[j])] += 1
    edges = [
        p for p, c in pair_n.items()
        if c >= relational.AFFINITY_MIN_SUPPORT
    ]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    assert list(out.k) == sorted(relational.RICH_CLUB_KS)
    for r in out.itertuples():
        rich = {n for n, d in deg.items() if d > r.k}
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        assert r.n_nodes == len(rich)
        assert r.n_edges == ek
        if len(rich) >= 2:
            assert abs(
                r.phi - 2.0 * ek / (len(rich) * (len(rich) - 1))
            ) < 1e-6
            assert 0 <= r.phi <= 1
        else:
            assert pd.isna(r.phi)


def test_circadian_recompute(spark, sf_dir):
    out = parity.user_circadian_regularity(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    ev = ev.assign(hr=(us // 3_600_000_000) % 24)
    regs = []
    for u, grp in ev.groupby("user_id"):
        c = Counter(grp.hr)
        n = len(grp)
        h = sum(
            sorted(
                round(-(v / n) * math.log(v / n), 12) for v in c.values()
            )
        )
        regs.append(round(1.0 - h / parity._LN24, 6))
    assert out.n_users == len(regs)
    assert abs(out.mean_regularity - sum(sorted(regs)) / len(regs)) < 1e-6
    assert abs(out.q1 - np.percentile(regs, 25)) < 1e-6
    assert abs(out["median"] - np.percentile(regs, 50)) < 1e-6
    assert abs(out.q3 - np.percentile(regs, 75)) < 1e-6
    # regularity lives in [0, 1]
    assert all(0 <= r <= 1 for r in regs)


def test_ratio_to_ma_recompute(spark, sf_dir):
    out = parity.ratio_to_ma_seasonal_indices(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.ts.dt.normalize()
    cal = pd.date_range(days.min(), days.max(), freq="D")
    y = days.value_counts().reindex(cal, fill_value=0).sort_index()
    ed = (y.index - pd.Timestamp("1970-01-01")).days
    vals = [int(v) for v in y.values]
    per = defaultdict(list)
    for i in range(3, len(vals) - 3):
        ws = sum(vals[i - 3 : i + 4])
        r = round(vals[i] / (ws / 7.0), 12)
        per[int(ed[i]) % 7].append(r)
    raws = {d: sum(sorted(v)) / len(v) for d, v in per.items()}
    s = sum(sorted(round(r, 12) for r in raws.values()))
    assert list(out.dow) == sorted(raws)
    for r in out.itertuples():
        assert r.n_days == len(per[r.dow])
        assert abs(r.raw_index - raws[r.dow]) < 1e-6
        assert abs(r.norm_index - raws[r.dow] * 7.0 / s) < 1e-6
    # normalized indices sum to ~7
    assert abs(out.norm_index.sum() - 7.0) < 1e-4
