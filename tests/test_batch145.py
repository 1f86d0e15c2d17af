"""Tests: round-4 session-17 batch 145 — average precision, Youden J,
footrule."""

from __future__ import annotations

import pandas as pd

from lucene_mapreduce_spark.operators import fulltext, parity


def _scored(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    return ev.assign(
        p=ev.value / (ev.value + parity.BRIER_P_SHIFT),
        y=(ev.event_type == "purchase").astype(int),
    )


def test_ap_recompute(spark, sf_dir):
    out = parity.average_precision_score(spark, sf_dir).toPandas().iloc[0]
    ev = _scored(sf_dir).sort_values(
        ["p", "event_id"], ascending=[False, True]
    )
    tp = 0
    terms = []
    for k, y in enumerate(ev.y, 1):
        if y:
            tp += 1
            terms.append(round(tp / k, 12))
    n_pos = int(ev.y.sum())
    ap = sum(sorted(terms)) / n_pos
    assert (out.n, out.n_pos) == (len(ev), n_pos)
    assert abs(out.average_precision - ap) < 1e-6
    assert abs(out.baseline_prevalence - n_pos / len(ev)) < 1e-6
    # AP of any ranker sits between prevalence (random) and 1
    assert out.average_precision >= 0


def test_youden_recompute(spark, sf_dir):
    out = parity.youden_j_threshold(spark, sf_dir).toPandas().iloc[0]
    ev = _scored(sf_dir)
    per = (
        ev.groupby("p")
        .y.agg(["sum", "count"])
        .rename(columns={"sum": "pos"})
        .sort_index(ascending=False)
    )
    per["neg"] = per["count"] - per.pos
    tp_all, fp_all = per.pos.sum(), per.neg.sum()
    tp = fp = 0
    best = None
    for p, row in per.iterrows():
        tp += row.pos
        fp += row.neg
        j = round(tp / tp_all - fp / fp_all, 6)
        if best is None or j > best[0] or (j == best[0] and p < best[1]):
            if best is None or j > best[0]:
                best = (j, p, tp, fp)
    assert abs(out.threshold - best[1]) < 1e-6
    assert (out.tp, out.fp) == (best[2], best[3])
    assert abs(out.youden_j - best[0]) < 1e-6
    assert -1 <= out.youden_j <= 1


def test_footrule_recompute(spark, sf_dir):
    out = parity.spearman_footrule_pages(spark, sf_dir).toPandas().iloc[0]
    a = fulltext.bm25_topk_documents(spark, sf_dir).toPandas()
    b = fulltext.tfidf_topk(spark, sf_dir).toPandas()
    ra = dict(zip(a.doc_id.astype(int), a["rank"].astype(int)))
    rb = dict(zip(b.doc_id.astype(int), b["rank"].astype(int)))
    common = set(ra) & set(rb)
    fr = sum(abs(ra[d] - rb[d]) for d in common)
    assert out.n_common == len(common)
    assert out.footrule == fr
    assert abs(out.footrule_similarity - (1 - fr / 50.0)) < 1e-6
    assert out.n_common >= 1
