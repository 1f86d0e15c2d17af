"""Tests: round-4 session-17 batch 139 — Greenwood CI, competing
risks, salting plan."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _surv_rows(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    es = ev.ts.values.astype("datetime64[us]").astype("int64") // 1_000_000
    ev = ev.assign(es=es)
    t_end = int(ev.es.max())
    rows = []
    for u, grp in ev.groupby("user_id"):
        sign = grp[grp.event_type == "signup"]
        if sign.empty:
            continue
        s = int(sign.es.min())
        buys = grp[(grp.event_type == "purchase") & (grp.es > s)]
        if buys.empty:
            rows.append(((t_end - s) // 86400, 0))
        else:
            rows.append(((int(buys.es.min()) - s) // 86400, 1))
    return rows


def test_greenwood_recompute(spark, sf_dir):
    out = parity.km_greenwood_ci(spark, sf_dir).toPandas()
    rows = _surv_rows(sf_dir)
    days = sorted({t for t, _ in rows})
    lns = gw = 0.0
    dead = False
    exp_rows = []
    for t in days:
        d = sum(1 for tt, e in rows if tt == t and e)
        if d == 0:
            continue
        n = sum(1 for tt, _ in rows if tt >= t)
        if d < n:
            lns += round(math.log(1 - d / n), 12)
            gw += round(d / (n * (n - d)), 12)
        else:
            dead = True
        s = 0.0 if dead else math.exp(lns)
        se = s * math.sqrt(gw)
        exp_rows.append(
            (t, n, d, s, se, max(s - 1.96 * se, 0.0), min(s + 1.96 * se, 1.0))
        )
    assert len(out) == len(exp_rows)
    for r, e in zip(out.itertuples(), exp_rows):
        assert (r.t_days, r.n_risk, r.d) == e[:3]
        assert abs(r.s_km - e[3]) < 1e-6
        assert abs(r.se_greenwood - e[4]) < 1e-6
        assert abs(r.ci_lo - e[5]) < 1e-6
        assert abs(r.ci_hi - e[6]) < 1e-6
        assert r.ci_lo <= r.s_km <= r.ci_hi


def test_competing_risks_recompute(spark, sf_dir):
    out = parity.competing_risks_cif(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    es = ev.ts.values.astype("datetime64[us]").astype("int64") // 1_000_000
    ev = ev.assign(es=es)
    t_end = int(ev.es.max())
    rows = []
    for u, grp in ev.groupby("user_id"):
        sign = grp[grp.event_type == "signup"]
        if sign.empty:
            continue
        s = int(sign.es.min())
        post = grp[
            (grp.es > s) & (grp.event_type.isin(parity.CR_CAUSES))
        ].sort_values(["es", "event_type"])
        if post.empty:
            rows.append((None, (t_end - s) // 86400))
        else:
            first = post.iloc[0]
            rows.append((first.event_type, (int(first.es) - s) // 86400))
    days = sorted({t for _, t in rows})
    lns = 0.0
    dead = False
    cif = {c: 0.0 for c in parity.CR_CAUSES}
    exp = []
    for t in days:
        dc = {
            c: sum(1 for cc, tt in rows if cc == c and tt == t)
            for c in parity.CR_CAUSES
        }
        d = sum(dc.values())
        if d == 0:
            continue
        n = sum(1 for _, tt in rows if tt >= t)
        s_prev = 0.0 if dead else math.exp(lns)
        for c in parity.CR_CAUSES:
            cif[c] += round(s_prev * dc[c] / n, 12)
        if d < n:
            lns += round(math.log(1 - d / n), 12)
        else:
            dead = True
        exp.append((t, n, dc, dict(cif)))
    assert len(out) == len(exp)
    for r, (t, n, dc, cf) in zip(out.itertuples(), exp):
        assert (r.t_days, r.n_risk) == (t, n)
        for c in parity.CR_CAUSES:
            assert getattr(r, f"d_{c}") == dc[c]
            assert abs(getattr(r, f"cif_{c}") - cf[c]) < 1e-6
    # CIFs are nondecreasing and their sum stays <= 1
    for c in parity.CR_CAUSES:
        col = out[f"cif_{c}"].tolist()
        assert col == sorted(col)
    assert (out.cif_purchase + out.cif_error <= 1.0 + 1e-9).all()


def test_salt_plan_recompute(spark, sf_dir):
    out = relational.salt_factor_plan(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    per = Counter(li.l_partkey)
    total = len(li)
    target = (total + relational.SALT_DENOM - 1) // relational.SALT_DENOM
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[
        : relational.SALT_TOP_K
    ]
    assert len(out) == len(ranked)
    for r, (pk, n) in zip(out.itertuples(), ranked):
        sf = (n + target - 1) // target
        rps = (n + sf - 1) // sf
        assert (int(r.l_partkey), r.n_rows) == (pk, n)
        assert r.target_rows == target
        assert r.salt_factor == sf
        assert abs(r.share_before - n / total) < 1e-6
        assert abs(r.share_after - rps / total) < 1e-6
        assert r.share_after <= r.share_before + 1e-12
