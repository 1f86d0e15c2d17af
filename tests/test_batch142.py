"""Tests: round-4 session-17 batch 142 — MaxP retrieval, QI ladder,
tenure hazard."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, textstats


def test_maxp_recompute(spark, sf_dir):
    out = fulltext.maxp_passage_retrieval_topk(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    n = len(docs)
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in qts}
    w = {
        t: round(math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), 12)
        for t in qts
    }
    W = fulltext.MAXP_W
    scored = []
    for d, tk in toks.items():
        if not any(t in tk for t in qts):
            continue
        best = None
        for i in range(1, max(1, len(tk) - W + 1) + 1):
            win = set(tk[i - 1 : i - 1 + W])
            s = round(sum(w[t] for t in qts if t in win), 6)
            if s > 0 and (best is None or s > best):
                best = s
        if best is not None:
            scored.append((best, d))
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[: fulltext.MAXP_K]
    got = [(round(float(r.maxp_score), 6), int(r.doc_id)) for r in out.itertuples()]
    assert got == top
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_qi_ladder_recompute(spark, sf_dir):
    out = textstats.qi_ladder_kmin(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lens = [
        len(tokenize_string(t)) // textstats.QI_LEN_BUCKET
        for t in docs.text
    ]
    keys = {
        "lang": list(docs.lang),
        "lang+source": list(zip(docs.lang, docs.source)),
        "lang+source+len": list(zip(docs.lang, docs.source, lens)),
    }
    n = len(docs)
    assert list(out.qi_set) == sorted(keys)
    for name, ks in keys.items():
        c = Counter(ks)
        row = out[out.qi_set == name].iloc[0]
        assert row.n_classes == len(c)
        assert row.k_min == min(c.values())
        singles = sum(1 for v in c.values() if v == 1)
        assert abs(row.singleton_share - singles / n) < 1e-6
    # anonymity only erodes as the QI set widens
    k = dict(zip(out.qi_set, out.k_min))
    assert k["lang"] >= k["lang+source"] >= k["lang+source+len"]


def test_tenure_hazard_recompute(spark, sf_dir):
    out = parity.tenure_hazard_table(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    ev = ev.assign(wk=(us // 86_400_000_000) // 7)
    max_wk = int(ev.wk.max())
    rows = []
    for u, grp in ev.groupby("user_id"):
        w0, w1 = int(grp.wk.min()), int(grp.wk.max())
        rows.append((w1 - w0, int(w1 < max_wk)))
    per = {}
    for t, c in rows:
        a = per.setdefault(t, [0, 0])
        a[0] += 1
        a[1] += c
    assert list(out.tenure_w) == sorted(per)
    for r in out.itertuples():
        at_risk = sum(
            a[0] for t, a in per.items() if t >= r.tenure_w
        )
        assert r.n_at_risk == at_risk
        assert r.n_churned == per[r.tenure_w][1]
        assert abs(r.hazard - per[r.tenure_w][1] / at_risk) < 1e-6
    # every user appears exactly once across the table
    assert out.n_at_risk.iloc[0] == len(rows)
