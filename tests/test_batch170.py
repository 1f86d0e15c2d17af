"""Tests: round-4 session-18 batch 170 — fan-out tail, ICC, RTM."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity


def test_fanout_recompute(spark, sf_dir):
    out = parity.fanout_tail_latency(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    order = sorted(
        zip(
            ev.event_id.map(
                lambda i: hashlib.md5(f"fo:{i}".encode()).hexdigest()
            ),
            ev.event_id,
            ev.value,
        )
    )
    lats = [v for _, _, v in order]
    nq = len(lats) // parity.FANOUT_K
    maxima = [
        max(lats[i * 4 : i * 4 + 4]) for i in range(nq)
    ]
    assert out.n_calls == len(lats)
    assert out.n_fanouts == nq
    assert abs(out.single_p50 - np.percentile(ev.value, 50)) < 1e-5
    assert abs(out.fanout_p50 - np.percentile(maxima, 50)) < 1e-5
    assert abs(out.fanout_p99 - np.percentile(maxima, 99)) < 1e-5
    # the tail-at-scale effect: fan-out median far above single median
    assert out.fanout_p50 > out.single_p50
    assert abs(out.p50_amplification - out.fanout_p50 / out.single_p50) < 1e-5


def test_icc_recompute(spark, sf_dir):
    out = parity.icc_two_way_raters(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    k = parity.ICC_RATERS
    mat = np.zeros((len(docs), k))
    for i, r in enumerate(docs.itertuples()):
        for j in range(k):
            noise = (
                int(
                    hashlib.md5(
                        f"icc{j}:{r.doc_id}".encode()
                    ).hexdigest()[:13],
                    16,
                )
                % parity.ICC_NOISE
                - 10
            )
            mat[i, j] = r.n_chars % 100 + noise
    n = len(docs)
    grand = mat.mean()
    msr = k * ((mat.mean(axis=1) - grand) ** 2).sum() / (n - 1)
    msc = n * ((mat.mean(axis=0) - grand) ** 2).sum() / (k - 1)
    sse = ((mat - mat.mean(axis=1, keepdims=True)
            - mat.mean(axis=0, keepdims=True) + grand) ** 2).sum()
    mse = sse / ((n - 1) * (k - 1))
    icc = (msr - mse) / (msr + (k - 1) * mse + k * (msc - mse) / n)
    assert (out.n_subjects, out.k_raters) == (n, k)
    assert abs(out.ms_rows - msr) < 1e-4
    assert abs(out.ms_cols - msc) < 1e-4
    assert abs(out.ms_error - mse) < 1e-4
    assert abs(out.icc_2_1 - icc) < 1e-5
    # the shared n_chars signal dominates the +-10 noise
    assert out.icc_2_1 > 0.5


def test_rtm_recompute(spark, sf_dir):
    out = parity.regression_to_mean_audit(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.astype("int64")
    mid = (us.min() + us.max()) // 2
    h1 = us[us < mid].groupby(ev.user_id).size()
    h2 = us[us >= mid].groupby(ev.user_id).size()
    users = sorted(set(h1.index) | set(h2.index))
    per = pd.DataFrame(
        {
            "h1": [int(h1.get(u, 0)) for u in users],
            "h2": [int(h2.get(u, 0)) for u in users],
        },
        index=users,
    )
    top = per.reset_index().sort_values(
        ["h1", "index"], ascending=[False, True]
    ).head(parity.RTM_TOP_N)
    t1, t2 = per.h1.sum(), per.h2.sum()
    for i, row in enumerate(out.itertuples()):
        want = top.iloc[i]
        assert row.user_id == want["index"]
        assert (row.h1, row.h2) == (want.h1, want.h2)
        assert abs(row.leader_ratio - want.h2 / want.h1) < 1e-6
        assert abs(row.population_ratio - t2 / t1) < 1e-6
