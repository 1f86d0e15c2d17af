"""Tests: round-4 session-17 batch 147 — error MTBF, Theil
decomposition, Cohen's d."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_mtbf_recompute(spark, sf_dir):
    out = parity.error_mtbf_report(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    err = ev[ev.event_type == "error"].copy()
    es = err.ts.values.astype("datetime64[us]").astype("int64") // 1_000_000
    err = err.assign(es=es).sort_values(["es", "event_id"])
    gaps = [int(b) - int(a) for a, b in zip(err.es, err.es[1:])]
    span = (int(err.es.max()) - int(err.es.min())) / 86400.0
    assert out.n_errors == len(err)
    assert out.n_gaps == len(gaps)
    assert abs(out.mtbf_s - sum(gaps) / len(gaps)) < 1e-5
    assert abs(out.median_gap_s - np.percentile(gaps, 50)) < 1e-6
    assert abs(out.p95_gap_s - np.percentile(gaps, 95)) < 1e-6
    assert abs(out.errors_per_day - len(err) / span) < 1e-5


def test_theil_decomposition_recompute(spark, sf_dir):
    out = parity.theil_decomposition_nations(spark, sf_dir).toPandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    o = orders.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    )
    o["x"] = o.o_totalprice.round(2)
    sx = o.x.sum()
    n = len(o)
    mu_all = sx / n
    t_between = 0.0
    withins = {}
    shares = {}
    for nk, grp in o.groupby("c_nationkey"):
        sxi, ni = grp.x.sum(), len(grp)
        mui = sxi / ni
        shares[nk] = sxi / sx
        t_between += round(
            (sxi / sx) * round(math.log(mui / mu_all), 12), 12
        )
        withins[nk] = sum(
            sorted(
                round((x / sxi) * round(math.log(x / mui), 12), 12)
                for x in grp.x
            )
        )
    names = dict(zip(nation.n_nationkey, nation.n_name))
    inv = {v: k for k, v in names.items()}
    for r in out.itertuples():
        nk = inv[r.n_name]
        assert abs(r.revenue_share - shares[nk]) < 1e-6
        assert abs(r.t_within - withins[nk]) < 1e-5
        assert abs(r.t_between - t_between) < 1e-5
    # additivity: T_total == T_between + sum share_i T_within_i
    # (Theil-T in revenue-share form: sum (x/sx) ln(x/mu))
    t_total = sum(
        sorted(
            round((x / sx) * round(math.log(x / mu_all), 12), 12)
            for x in o.x
        )
    )
    combo = t_between + sum(
        shares[nk] * withins[nk] for nk in withins
    )
    assert abs(t_total - combo) < 1e-6


def test_cohens_d_recompute(spark, sf_dir):
    out = parity.cohens_d_arms(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    arm = ev.user_id.map(
        lambda u: int(
            hashlib.md5(f"lr:{u}".encode()).hexdigest()[:13], 16
        )
        % 2
    )
    stats = {}
    for a in (0, 1):
        vals = ev.value[arm == a]
        n = len(vals)
        s = sum(sorted(round(float(v), 6) for v in vals))
        ss = sum(sorted(round(float(v) ** 2, 12) for v in vals))
        stats[a] = (n, s, ss)
    n0, s0, ss0 = stats[0]
    n1, s1, ss1 = stats[1]
    m0, m1 = s0 / n0, s1 / n1
    sp = math.sqrt(
        ((ss0 - s0 * m0) + (ss1 - s1 * m1)) / (n0 + n1 - 2)
    )
    d = (m1 - m0) / sp
    g = d * (1 - 3 / (4 * (n0 + n1 - 2) - 1))
    assert (out.n_arm0, out.n_arm1) == (n0, n1)
    assert abs(out.mean_arm0 - m0) < 1e-5
    assert abs(out.mean_arm1 - m1) < 1e-5
    assert abs(out.pooled_sd - sp) < 1e-5
    assert abs(out.cohens_d - d) < 1e-6
    assert abs(out.hedges_g - g) < 1e-6
    # null-arm split: effect should be tiny
    assert abs(out.cohens_d) < 0.5
