"""Tests: round-4 session-18 batch 176 — ATE, Sharpe/Sortino, a-nDCG."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.operators import fulltext, parity


def test_stratified_ate_recompute(spark, sf_dir):
    out = parity.stratified_ate_quintiles(spark, sf_dir).toPandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    df = li.assign(
        t=(li.l_discount.round(2) >= parity.ATE_TREAT_DISCOUNT).astype(int),
        y=(li.l_extendedprice / li.l_quantity).round(6),
    ).sort_values(
        ["l_quantity", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    n = len(df)
    sizes = [n // 5 + (1 if i < n % 5 else 0) for i in range(5)]
    idx = 0
    ate = 0.0
    for s, sz in enumerate(sizes, start=1):
        chunk = df.iloc[idx : idx + sz]
        idx += sz
        eff = (
            chunk.y[chunk.t == 1].mean() - chunk.y[chunk.t == 0].mean()
        )
        row = out[out.stratum == s].iloc[0]
        assert row.n == sz
        assert row.nt == int((chunk.t == 1).sum())
        assert abs(row.stratum_effect - eff) < 1e-5
        ate += round(sz / n, 6) * round(eff, 6)
    assert abs(out.stratified_ate.iloc[0] - ate) < 1e-4


def test_sharpe_sortino_recompute(spark, sf_dir):
    out = parity.sharpe_sortino_daily(spark, sf_dir).toPandas().iloc[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ed = o.o_orderdate.astype("int64") // 86_400_000_000
    rev = o.o_totalprice.round(2).groupby(ed).sum()
    cal = pd.Series(
        0.0, index=range(int(ed.min()), int(ed.max()) + 1)
    )
    cal.loc[rev.index] = rev
    delta = cal.diff().dropna()
    mean, sd = delta.mean(), delta.std(ddof=1)
    ddev = math.sqrt((delta[delta < 0] ** 2).sum() / len(delta))
    cum = cal.cumsum()
    mdd = (cum.cummax() - cum).max()
    assert out.n_changes == len(delta)
    assert abs(out.mean_delta - mean) < 1e-4
    assert abs(out.sd_delta - sd) < 1e-4
    assert abs(out.downside_dev - ddev) < 1e-4
    assert abs(out.sharpe - mean / sd) < 1e-5
    assert abs(out.sortino - mean / ddev) < 1e-5
    assert abs(out.max_drawdown - mdd) < 1e-2
    # Sortino magnifies Sharpe when downside risk is the smaller part
    assert abs(out.sortino) >= abs(out.sharpe) * 0.5


def test_alpha_ndcg_recompute(spark, sf_dir):
    out = fulltext.alpha_ndcg_diversity(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from lucene_mapreduce_spark.query.bm25 import bm25_oracle_pandas

    page = bm25_oracle_pandas(
        docs, fulltext.FLAGSHIP_QUERY, k=fulltext.ANDCG_K
    ).merge(docs[["doc_id", "lang"]], on="doc_id")
    seen = {}
    dcg = 0.0
    for r in page.sort_values("rank").itertuples():
        k = seen.get(r.lang, 0)
        seen[r.lang] = k + 1
        dcg += (1.0 / 2**k) / (math.log(r.rank + 1) / math.log(2))
    gains = sorted(
        (1.0 / 2**j for cnt in seen.values() for j in range(cnt)),
        reverse=True,
    )
    idcg = sum(
        g / (math.log(pos + 2) / math.log(2))
        for pos, g in enumerate(gains)
    )
    assert out.k_used == len(page)
    assert out.n_aspects == len(seen)
    assert abs(out.alpha_dcg - dcg) < 1e-5
    assert abs(out.ideal_dcg - idcg) < 1e-5
    assert abs(out.alpha_ndcg - dcg / idcg) < 1e-6
    assert 0 < out.alpha_ndcg <= 1
