"""Tests: round-4 session-11 batch 27 (chunk-stitch seams, trigram
lang-ID confusion, Holt linear smoothing) — independent recomputes."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import dedup, parity, textstats


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _events(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_chunk_stitch_recompute(spark, sf_dir):
    out = dedup.chunk_stitch_candidates(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k = dedup.STITCH_K
    heads, tails = {}, {}
    for r in docs.itertuples():
        t = tokenize_string(r.text)
        if len(t) >= k:
            heads.setdefault(" ".join(t[:k]), []).append(int(r.doc_id))
            tails.setdefault(" ".join(t[-k:]), []).append(int(r.doc_id))
    want = sorted(
        (a, b)
        for key, asides in tails.items()
        for a in asides
        for b in heads.get(key, [])
        if a != b
    )
    got = sorted(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert got == want
    # the sf0.01 corpus (the gate's scale) yields real seam pairs
    out01 = dedup.chunk_stitch_candidates(spark, "/root/testdata/sf0.01").toPandas()
    assert len(out01) > 0


def test_trigram_langid_covers_corpus_and_beats_chance(spark, sf_dir):
    out = textstats.trigram_langid_confusion(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    n_eligible = (docs["text"].str.lower().str.len() >= 3).sum()
    assert out["n_docs"].sum() == n_eligible
    # diagonal accuracy must beat uniform chance over the lang set
    acc = out[out["lang"] == out["predicted"]]["n_docs"].sum() / out[
        "n_docs"
    ].sum()
    assert acc > 1.0 / docs["lang"].nunique()


def test_trigram_langid_one_doc_recompute(spark, sf_dir):
    # recompute the predicted lang for one doc against hand-built profiles
    docs = _docs(sf_dir)
    from collections import Counter, defaultdict

    dg: dict[int, Counter] = {}
    prof: dict[str, Counter] = defaultdict(Counter)
    for r in docs.itertuples():
        low = r.text.lower()
        if len(low) < 3:
            continue
        c = Counter(low[i : i + 3] for i in range(len(low) - 2))
        dg[int(r.doc_id)] = c
        prof[r.lang].update(c)
    did = min(dg)
    c = dg[did]
    ssd = sum(v * v for v in c.values())
    best = None
    for lang in sorted(prof):
        p = prof[lang]
        dot = sum(v * p[g] for g, v in c.items())
        ssp = sum(v * v for v in p.values())
        cos = round(dot / (math.sqrt(ssd) * math.sqrt(ssp)), 6)
        if best is None or cos > best[0]:
            best = (cos, lang)
    # run the operator's intermediate the same way: top prediction wins
    out = textstats.trigram_langid_confusion(spark, sf_dir).toPandas()
    true_lang = docs.set_index("doc_id").loc[did, "lang"]
    # the confusion cell (true_lang, best_lang) must be populated
    cell = out[(out["lang"] == true_lang) & (out["predicted"] == best[1])]
    assert len(cell) == 1 and cell["n_docs"].iloc[0] >= 1


def test_holt_linear_recompute(spark, sf_dir):
    out = parity.holt_linear_pipeline(spark, sf_dir).toPandas()
    ev = _events(sf_dir)
    days = ev["ts"].dt.date
    cal = pd.date_range(days.min(), days.max(), freq="D").date
    ns = (
        days.value_counts().reindex(cal, fill_value=0).sort_index()
        .to_numpy(float)
    )
    assert len(out) == len(ns)
    lvl, trd = ns[0], 0.0
    rows = out.sort_values("day").reset_index(drop=True)
    assert rows.loc[0, "level"] == round(lvl, 6)
    assert rows.loc[0, "trend"] == 0.0
    for i in range(1, len(ns)):
        lnew = 0.5 * ns[i] + 0.5 * (lvl + trd)
        trd = 0.5 * (lnew - lvl) + 0.5 * trd
        lvl = lnew
        # 1e-6 band: Python round() is half-even, Spark/DuckDB round is
        # half-up — exact .5 ties (possible with 0.5 gains) differ by 1e-6
        assert abs(rows.loc[i, "level"] - round(lvl, 6)) < 1.01e-6
        assert abs(rows.loc[i, "trend"] - round(trd, 6)) < 1.01e-6
