"""Tests: round-4 session-18 batch 159 — Kendall W, RR debias, dot-cos."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import parity, similarity


def _md5i(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_kendalls_w_recompute(spark, sf_dir):
    out = parity.kendalls_w_concordance(spark, sf_dir).toPandas().iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = (
        li.assign(month=li.l_shipdate.dt.strftime("%Y-%m"))
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    months = sorted(j.month.unique())[: parity.KENDALL_W_MONTHS]
    all_nations = pd.read_parquet(f"{sf_dir}/nation.parquet").n_name
    per = (
        j[j.month.isin(months)]
        .groupby(["month", "n_name"])
        .l_extendedprice.sum()
        .round(2)
        .unstack(0)
        .reindex(all_nations)
        .fillna(0.0)
    )
    ranks = per.rank(method="average")
    m, nn = ranks.shape[1], ranks.shape[0]
    rs = ranks.sum(axis=1)
    s = ((rs - m * (nn + 1) / 2) ** 2).sum()
    tt = 0
    for col in per.columns:
        for _, cnt in per[col].value_counts().items():
            tt += cnt**3 - cnt
    w = 12 * s / (m * m * (nn**3 - nn) - m * tt)
    assert (out.n_subjects, out.m_raters) == (nn, m)
    assert out.tie_term == tt
    assert abs(out.kendalls_w - w) < 1e-6
    assert abs(out.friedman_chi2 - m * (nn - 1) * w) < 1e-4
    assert 0 <= out.kendalls_w <= 1


def test_randomized_response_recompute(spark, sf_dir):
    out = parity.randomized_response_debias(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    langs = sorted(docs.lang.unique())
    cid = {v: i for i, v in enumerate(langs)}
    L, n = len(langs), len(docs)
    rep = {i: 0 for i in range(L)}
    true = {i: 0 for i in range(L)}
    for r in docs.itertuples():
        t = cid[r.lang]
        true[t] += 1
        if _md5i(f"rr1:{r.doc_id}") < parity._RR_KEEP_TH:
            rep[t] += 1
        else:
            rep[_md5i(f"rr2:{r.doc_id}") % L] += 1
    for row in out.itertuples():
        i = cid[row.lang]
        assert row.true_n == true[i]
        assert row.reported_n == rep[i]
        est = n * (rep[i] / n - 0.25 / L) / 0.75
        assert abs(row.est_n - est) < 1e-2 + 1e-9
    # the debiased estimate beats the raw report on total abs error
    raw_err = sum(abs(rep[cid[r.lang]] - r.true_n) for r in out.itertuples())
    assert out.abs_err.sum() <= raw_err + 1e-6


def test_dot_vs_cosine_recompute(spark, sf_dir):
    out = similarity.dot_vs_cosine_overlap(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    p = min(vecs, key=lambda i: (hashlib.md5(f"{i}:dvc".encode()).hexdigest(), i))
    pv = vecs[p]
    rows = []
    for i, v in vecs.items():
        if i == p:
            continue
        dp = round(float(np.dot(v, pv)), 6)
        cos = round(
            float(np.dot(v, pv) / (np.linalg.norm(v) * np.linalg.norm(pv))),
            6,
        )
        rows.append((i, dp, cos))
    top_d = sorted(rows, key=lambda r: (-r[1], r[0]))[: similarity.DVC_K]
    top_c = sorted(rows, key=lambda r: (-r[2], r[0]))[: similarity.DVC_K]
    rd = {r[0]: i + 1 for i, r in enumerate(top_d)}
    rc = {r[0]: i + 1 for i, r in enumerate(top_c)}
    inter = set(rd) & set(rc)
    assert out.k == similarity.DVC_K
    assert out.n_overlap == len(inter)
    assert abs(out.jaccard - len(inter) / (20 - len(inter))) < 1e-6
    assert out.footrule_common == sum(abs(rd[i] - rc[i]) for i in inter)
