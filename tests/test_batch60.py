"""Tests: round-4 session-14 batch 60 — Kaplan-Meier survival, cohort
LTV curve, multi-word synonym query."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity


def test_kaplan_meier_recompute(spark, sf_dir):
    out = parity.kaplan_meier_survival(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["es"] = ev.ts.astype("int64") // 10**6
    t_end = int(ev.es.max())
    obs = []
    for u, g in ev.groupby("user_id"):
        s = g[g.event_type == "signup"].es
        if s.empty:
            continue
        s0 = int(s.min())
        p = g[(g.event_type == "purchase") & (g.es > s0)].es
        if p.empty:
            obs.append((t_end - s0, 0))
        else:
            obs.append((int(p.min()) - s0, 1))
    n_total = len(obs)
    times = sorted({t for t, e in obs if e == 1})
    assert list(out.t) == times
    surv = 1.0
    logsum = 0.0
    hit_zero = False
    for row in out.itertuples(index=False):
        n = sum(1 for t, _ in obs if t >= row.t)
        d = sum(1 for t, e in obs if t == row.t and e == 1)
        assert row.n_at_risk == n
        assert row.d == d
        if d == n:
            hit_zero = True
        if not hit_zero:
            logsum += round(math.log(1 - d / n), 12)
            assert abs(row.survival - round(math.exp(logsum), 6)) < 1e-9
        else:
            assert row.survival == 0.0
    # survival is monotone nonincreasing and starts below 1
    assert (out.survival.diff().dropna() <= 1e-12).all()
    assert out.survival.iloc[0] < 1.0


def test_cohort_ltv_recompute(spark, sf_dir):
    out = parity.cohort_ltv_curve(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["week"] = ev.ts.astype("int64") // (604800 * 10**12 // 10**6)
    cohort = ev.groupby("user_id").week.min().rename("cw")
    ev = ev.join(cohort, on="user_id")
    ev["off"] = ev.week - ev.cw
    ev["rev"] = ev.value.round(2)
    want = (
        ev.groupby(["cw", "off"]).rev.sum().round(2).rename("revenue").reset_index()
    )
    nusers = cohort.value_counts()
    got = out.set_index(["cohort_week", "week_offset"])
    assert len(out) == len(want)
    for r in want.itertuples(index=False):
        row = got.loc[(r.cw, r.off)]
        assert abs(row.revenue - r.revenue) < 1e-9
        assert row.n_users == nusers[r.cw]
    # cumulative matches the running sum per cohort
    for cw, g in out.groupby("cohort_week"):
        g = g.sort_values("week_offset")
        assert np.allclose(g.cum_revenue, g.revenue.cumsum().round(2), atol=1e-9)


def test_multiword_synonym_recompute(spark, sf_dir):
    from lucene_mapreduce_spark.query.bm25 import B, K1

    out = fulltext.multiword_synonym_query(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    term = fulltext.MW_SYNONYM_TERM
    w0, w1 = fulltext.MW_SYNONYM_PHRASE
    rows = {}
    dls = {}
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        dls[r.doc_id] = len(ts)
        tf_t = ts.count(term)
        tf_p = sum(1 for a, b in zip(ts, ts[1:]) if a == w0 and b == w1)
        if tf_t or tf_p:
            rows[r.doc_id] = (tf_t, tf_p)
    n = len(dls)
    avgdl = sum(dls.values()) / n
    df_t = sum(1 for tf_t, _ in rows.values() if tf_t > 0)
    df_p = sum(1 for _, tf_p in rows.values() if tf_p > 0)
    df_b = max(df_t, df_p)
    idf = math.log(1 + (n - df_b + 0.5) / (df_b + 0.5))
    scored = {}
    for d, (tf_t, tf_p) in rows.items():
        tf = tf_t + tf_p
        scored[d] = round(
            idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dls[d] / avgdl)), 6
        )
    want = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(out.doc_id) == [d for d, _ in want]
    for row in out.itertuples(index=False):
        assert abs(row.score - scored[row.doc_id]) < 1e-9
    # the phrase leg actually contributes on the synthetic corpus
    assert df_p > 0
