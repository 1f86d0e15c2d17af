"""Tests: round-4 session-17 batch 129 — log-rank test, RMST, price
elasticity."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.operators import parity, relational


def _surv_table(sf_dir):
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
            t, e = (t_end - s) // 86400, 0
        else:
            t, e = (int(buys.es.min()) - s) // 86400, 1
        g = int(hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16) % 2
        rows.append((g, t, e))
    return rows


def test_logrank_recompute(spark, sf_dir):
    out = parity.logrank_test(spark, sf_dir).toPandas().iloc[0]
    rows = _surv_table(sf_dir)
    days = sorted({t for _, t, _ in rows})
    o_e = v_sum = 0.0
    oes, vs = [], []
    for t in days:
        d1 = sum(1 for g, tt, e in rows if g == 1 and tt == t and e)
        d0 = sum(1 for g, tt, e in rows if g == 0 and tt == t and e)
        if d1 + d0 == 0:
            continue
        n1 = sum(1 for g, tt, _ in rows if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in rows if g == 0 and tt >= t)
        n, d = n1 + n0, d1 + d0
        oes.append(round(d1 - n1 * d / n, 12))
        if n > 1:
            vs.append(round(d * (n1 / n) * (1 - n1 / n) * ((n - d) / (n - 1)), 12))
    o_e = sum(sorted(oes))
    v_sum = sum(sorted(vs))
    assert out.n_users_0 == sum(1 for g, _, _ in rows if g == 0)
    assert out.n_users_1 == sum(1 for g, _, _ in rows if g == 1)
    assert out.n_deaths_0 == sum(e for g, _, e in rows if g == 0)
    assert out.n_deaths_1 == sum(e for g, _, e in rows if g == 1)
    assert abs(out.o_minus_e - o_e) < 1e-6
    assert abs(out.var_sum - v_sum) < 1e-6
    assert abs(out.z_stat - o_e / math.sqrt(v_sum)) < 1e-6


def test_rmst_recompute(spark, sf_dir):
    out = parity.rmst_survival(spark, sf_dir).toPandas().iloc[0]
    rows = _surv_table(sf_dir)
    tau = float(parity.RMST_TAU_DAYS)
    days = sorted({t for _, t, _ in rows})
    death_days = []
    s_log = 0.0
    dead = False
    svals = []
    for t in days:
        d = sum(1 for _, tt, e in rows if tt == t and e)
        if d == 0:
            continue
        n = sum(1 for _, tt, _ in rows if tt >= t)
        if d < n:
            s_log += round(math.log(1 - d / n), 12)
        else:
            dead = True
        death_days.append(t)
        svals.append(0.0 if dead else math.exp(s_log))
    rmst = min(death_days[0], tau)
    area_terms = []
    for i, t in enumerate(death_days):
        t_next = death_days[i + 1] if i + 1 < len(death_days) else tau
        seg = max(min(t_next, tau) - min(t, tau), 0.0)
        area_terms.append(round(svals[i] * seg, 12))
    rmst += sum(sorted(area_terms))
    assert out.tau_days == parity.RMST_TAU_DAYS
    assert out.n_users == len(rows)
    assert out.n_deaths == sum(e for _, _, e in rows)
    assert abs(out.rmst_days - rmst) < 1e-6
    # RMST is bounded by tau
    assert 0 <= out.rmst_days <= tau


def test_elasticity_recompute(spark, sf_dir):
    out = relational.price_elasticity_ols(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = [round(math.log(p / q), 12) for p, q in zip(li.l_extendedprice, li.l_quantity)]
    y = [round(math.log(q), 12) for q in li.l_quantity]
    n = len(x)
    sx, sy = sum(sorted(x)), sum(sorted(y))
    sxy = sum(sorted(round(a * b, 12) for a, b in zip(x, y)))
    sxx = sum(sorted(round(a * a, 12) for a in x))
    syy = sum(sorted(round(b * b, 12) for b in y))
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    b = cov / vx
    a = (sy - b * sx) / n
    assert out.n == n
    assert abs(out.elasticity - b) < 1e-5
    assert abs(out.intercept - a) < 1e-5
    assert abs(out.r2 - (cov * cov) / (vx * vy)) < 1e-5
    assert 0 <= out.r2 <= 1
