"""Tests: round-4 session-18 batch 162 — HMM forward, Simpson, MaxScore."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import fulltext, parity


def test_hmm_forward_recompute(spark, sf_dir):
    out = parity.hmm_forward_loglik(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ed = ev.ts.astype("int64") // 86_400_000_000
    cal = range(int(ed.min()), int(ed.max()) + 1)
    y = list(ed.value_counts().reindex(cal, fill_value=0).sort_index())
    n, s1 = len(y), sum(y)
    obs = [1.0 if c * n > s1 else 0.0 for c in y]
    a0, a1, ll = 0.5, 0.5, 0.0
    for o in obs:
        p0 = a0 * 0.8 + a1 * 0.3
        p1 = a0 * 0.2 + a1 * 0.7
        e0 = 0.2 if o == 1.0 else 0.8
        e1 = 0.7 if o == 1.0 else 0.3
        na0, na1 = p0 * e0, p1 * e1
        s = na0 + na1
        a0, a1 = na0 / s, na1 / s
        ll += round(math.log(s), 12)
    assert out.n_days == n
    assert out.n_high == sum(int(o) for o in obs)
    assert abs(out.loglik - ll) < 1e-6
    assert abs(out.p_state0_final - a0) < 1e-6
    assert abs(out.p_state1_final - a1) < 1e-6
    # a 2-state HMM cannot beat the iid entropy bound by much but
    # must be a valid log-probability
    assert out.loglik < 0


def test_simpsons_check_recompute(spark, sf_dir):
    out = parity.simpsons_paradox_check(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = li.l_discount.round(2)
    y = li.l_extendedprice.round(2)
    r_all = np.corrcoef(x, y)[0, 1]
    row = out[out.stratum == "ALL"].iloc[0]
    assert row.n_rows == len(li)
    assert abs(row.pearson_r - r_all) < 1e-6
    for flag, g in li.groupby("l_returnflag"):
        r = np.corrcoef(g.l_discount.round(2), g.l_extendedprice.round(2))[
            0, 1
        ]
        rr = out[out.stratum == flag].iloc[0]
        assert rr.n_rows == len(g)
        assert abs(rr.pearson_r - r) < 1e-6
        assert rr.sign == np.sign(round(r, 6))


def test_maxscore_recompute(spark, sf_dir):
    out = fulltext.maxscore_term_partition(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    from lucene_mapreduce_spark.functions.tokenize import tokenize_string
    from lucene_mapreduce_spark.query.bm25 import (
        bm25_contribution,
        bm25_idf,
        bm25_oracle_pandas,
    )

    toks = docs.text.map(tokenize_string)
    dls = toks.map(len)
    n_docs, avgdl = len(docs), dls.sum() / len(docs)
    qterms = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    ubs = {}
    dfs = {
        t: sum(1 for tk in toks if t in tk) for t in qterms
    }
    for t in qterms:
        idf = bm25_idf(dfs[t], n_docs)
        best = 0.0
        for tk, dl in zip(toks, dls):
            tf = Counter(tk)[t]
            if tf:
                best = max(best, bm25_contribution(tf, dl, avgdl, idf))
        ubs[t] = round(best, 6)
    page = bm25_oracle_pandas(docs, fulltext.FLAGSHIP_QUERY,
                              k=fulltext.MAXSCORE_K)
    theta = round(page.score.round(6).min(), 6)
    ordered = sorted(qterms, key=lambda t: (ubs[t], t))
    cum = 0.0
    for i, row in enumerate(out.itertuples()):
        t = ordered[i]
        cum = round(cum + ubs[t], 6)
        assert row.term == t
        assert row.df_t == dfs[t]
        assert abs(row.ub - ubs[t]) < 1e-6
        assert abs(row.cum_ub_asc - cum) < 1e-5
        assert abs(row.theta - theta) < 1e-5
        assert row.essential == int(row.cum_ub_asc > row.theta)
    # at least one term must be essential or the page couldn't exist
    assert out.essential.sum() >= 1
