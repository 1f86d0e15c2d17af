"""Tests: round-4 session-16 batch 95 — t-closeness, selectivity
independence audit, PSI value drift."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import textstats


def test_t_closeness_recompute(spark, sf_dir):
    out = textstats.t_closeness_audit(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["len_b"] = docs.n_chars // 200
    gq = docs.lang.value_counts(normalize=True)
    ts = []
    for _, g in docs.groupby(["source", "len_b"]):
        p = g.lang.value_counts(normalize=True)
        t = 0.5 * sum(
            abs(round(p.get(lng, 0.0) - gq[lng], 12)) for lng in gq.index
        )
        ts.append(round(t, 6))
    assert r.n_classes == len(ts)
    assert abs(r.t_max - max(ts)) < 1e-5
    assert r.classes_above_t == sum(
        1 for t in ts if t > textstats.T_CLOSENESS_MAX
    )


def test_selectivity_recompute(spark, sf_dir):
    out = textstats.selectivity_independence_audit(
        spark, sf_dir
    ).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(docs)
    preds = {
        "lang_en__len_hi": (
            docs.lang == "en", docs.n_chars > 500,
        ),
        "src0__len_lo": (
            docs.source == "src0", docs.n_chars <= 300,
        ),
        "lang_de__src1": (
            docs.lang == "de", docs.source == "src1",
        ),
    }
    rows = {r.pred: r for r in out.itertuples()}
    assert set(rows) == set(preds)
    for name, (a, b) in preds.items():
        r = rows[name]
        na, nb, nab = int(a.sum()), int(b.sum()), int((a & b).sum())
        assert (r.na, r.nb, r.nab) == (na, nb, nab)
        est = (na / n) * (nb / n)
        act = nab / n
        assert abs(r.sel_independent - est) < 5e-7
        assert abs(r.sel_actual - act) < 5e-7
        if nab > 0:
            assert abs(r.q_error - max(est / act, act / est)) < 1e-4


def test_psi_recompute(spark, sf_dir):
    out = textstats.psi_value_drift(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    split = (int(us.min()) + int(us.max())) // 2
    ref = ev.value[us < split].astype(float).values
    cur = ev.value[us >= split].astype(float).values
    D = textstats.PSI_DECILES
    edges = np.quantile(ref, [i / D for i in range(1, D)])

    def hist(v):
        b = np.sum(v[:, None] > edges[None, :], axis=1)
        return np.bincount(b, minlength=D)

    hr, hc = hist(ref), hist(cur)
    psi = 0.0
    for i in range(D):
        p = max(hr[i] / hr.sum(), 1e-6)
        q = max(hc[i] / hc.sum(), 1e-6)
        psi += round((p - q) * math.log(p / q), 12)
    assert r.n_buckets == D
    assert abs(r.psi - psi) < 1e-5
    # two random halves of a stationary stream: PSI must read 'stable'
    assert r.psi < 0.1
