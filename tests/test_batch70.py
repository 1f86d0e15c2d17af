"""Tests: round-4 session-15 batch 70 — Nelson-Aalen hazard, time-decay
attribution, CUPED adjusted metric."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def _events(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("int64")
    return ev


def test_nelson_aalen_recompute(spark, sf_dir):
    out = parity.nelson_aalen_hazard(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    ev["es"] = ev.us // 10**6
    t_end = ev.es.max()
    signup = ev[ev.event_type == "signup"].groupby("user_id").es.min()
    pur = ev[ev.event_type == "purchase"][["user_id", "es"]].merge(
        signup.rename("s"), on="user_id"
    )
    fp = pur[pur.es > pur.s].groupby("user_id").es.min()
    obs = pd.DataFrame({"s": signup})
    obs["p"] = fp
    obs["t"] = np.where(obs.p.notna(), obs.p - obs.s, t_end - obs.s)
    obs["event"] = obs.p.notna().astype(int)
    grp = obs.groupby("t").agg(n_here=("event", "size"), d=("event", "sum"))
    grp = grp.sort_index()
    total = grp.n_here.sum()
    n_at_risk = total - grp.n_here.cumsum().shift(1, fill_value=0)
    tab = pd.DataFrame(
        {"n_at_risk": n_at_risk, "d": grp.d}
    ).loc[lambda f: f.d > 0]
    h = (tab.d / tab.n_at_risk).cumsum()
    assert list(out.t) == list(tab.index)
    assert list(out.n_at_risk) == list(tab.n_at_risk)
    assert list(out.d) == list(tab.d)
    assert np.allclose(out.cum_hazard, h.values, atol=5e-7)
    assert np.allclose(out.na_survival, np.exp(-h.values), atol=5e-7)
    # cumulative hazard is nondecreasing; exp(-H) dominates the KM curve
    assert out.cum_hazard.is_monotonic_increasing
    km = parity.kaplan_meier_survival(spark, sf_dir).toPandas()
    j = out.merge(km[["t", "survival"]], on="t")
    assert (j.na_survival >= j.survival - 1e-9).all()


def test_attribution_time_decay_recompute(spark, sf_dir):
    out = parity.attribution_time_decay(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    lam = float(parity.TD_LAM_LIT)
    lb = parity.TD_LOOKBACK_S * 10**6
    conv = ev[ev.event_type == parity.ATTR_CONVERSION]
    touch = ev[ev.event_type != parity.ATTR_CONVERSION]
    by_user = {u: g for u, g in touch.groupby("user_id")}
    credit: dict[str, float] = {}
    npoints: dict[str, int] = {}
    n_none = 0
    for r in conv.itertuples():
        g = by_user.get(r.user_id)
        if g is not None:
            g = g[(g.us < r.us) & (r.us - g.us <= lb)]
        if g is None or not len(g):
            n_none += 1
            continue
        ds = (r.us - g.us.values) // 10**6
        w = np.exp(ds.astype(float) * -lam)
        w = w / w.sum()
        for ch, cw in zip(g.event_type.values, w):
            credit[ch] = credit.get(ch, 0.0) + cw
            npoints[ch] = npoints.get(ch, 0) + 1
    got = {r.channel: (r.credit, r.n_touchpoints) for r in out.itertuples()}
    if n_none:
        assert got["(none)"] == (float(n_none), n_none)
    for ch, c in credit.items():
        assert abs(got[ch][0] - c) < 1e-4, ch
        assert got[ch][1] == npoints[ch]
    # total credit conserves the conversion count
    assert abs(out.credit.sum() - len(conv)) < 1e-3


def test_cuped_recompute(spark, sf_dir):
    out = parity.cuped_adjusted_metric(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    split = (int(ev.us.min()) + int(ev.us.max())) // 2
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": int((g.us < split).sum()),
                "y": float(
                    g[(g.us >= split) & (g.event_type == "purchase")]
                    .value.round(2)
                    .sum()
                ),
            }
        ),
        include_groups=False,
    )
    arm = [
        "A"
        if int(hashlib.md5(f"{u}:cuped".encode()).hexdigest()[:13], 16) % 2
        == 0
        else "B"
        for u in per.index
    ]
    per["arm"] = arm
    x, y = per.x.values.astype(float), per.y.values
    theta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
    xbar = x.mean()
    assert set(out.arm) == {"A", "B"}
    assert out.n.sum() == len(per)
    for r in out.itertuples():
        sub = per[per.arm == r.arm]
        assert r.n == len(sub)
        assert abs(r.mean_x - sub.x.mean()) < 1e-6
        assert abs(r.mean_y - sub.y.mean()) < 1e-4
        assert abs(r.theta - theta) < 1e-5
        want = sub.y.mean() - theta * (sub.x.mean() - xbar)
        assert abs(r.adjusted_mean - want) < 1e-4
    # the two arms share one pooled theta
    assert math.isclose(out.theta.iloc[0], out.theta.iloc[1])
