"""Tests: round-4 session-13 batch 43 (event-type Jaccard, weekly churn,
1-NN label confusion, GND significant terms) — independent recomputes."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, parity, similarity


def test_event_type_jaccard_recompute(spark, sf_dir):
    out = parity.event_type_user_jaccard(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = {
        t: set(g["user_id"]) for t, g in ev.groupby("event_type")
    }
    types = sorted(users)
    exp = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(users[ta] & users[tb])
            if inter:
                exp.append(
                    (
                        ta,
                        tb,
                        len(users[ta]),
                        len(users[tb]),
                        inter,
                        round(inter / len(users[ta] | users[tb]), 6),
                    )
                )
    got = [
        (r.ta, r.tb, int(r.n_a), int(r.n_b), int(r.n_inter), round(float(r.jaccard), 6))
        for r in out.itertuples()
    ]
    assert got == exp


def test_weekly_churn_recompute(spark, sf_dir):
    out = parity.weekly_churn_rate(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    week = (us // 86_400_000_000) // 7
    wu = set(zip(week, ev["user_id"]))
    weeks = defaultdict(set)
    for w, u in wu:
        weeks[w].add(u)
    mx = max(weeks)
    exp = []
    for w in sorted(weeks):
        if w >= mx:
            continue
        active = len(weeks[w])
        retained = len(weeks[w] & weeks.get(w + 1, set()))
        exp.append((w, active, retained, round((active - retained) / active, 6)))
    got = [
        (int(r.m), int(r.active), int(r.retained), round(float(r.churn_rate), 6))
        for r in out.itertuples()
    ]
    assert got == exp
    assert len(exp) > 0


def test_knn_confusion_recompute(spark, sf_dir):
    out = similarity.knn_label_confusion(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, np.float64) for r in emb.itertuples()}
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    conf = Counter()
    for qid in sorted(vecs):
        if qid % similarity.KNN_CONFUSION_MOD:
            continue
        qv = vecs[qid]
        best = None
        for vid, v in vecs.items():
            if vid == qid:
                continue
            c = round(
                float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv))), 6
            )
            key = (-c, vid)
            if best is None or key < best[0]:
                best = (key, labels[vid])
        conf[(labels[qid], best[1])] += 1
    got = {(int(r.label), int(r.nn_label)): int(r.n) for r in out.itertuples()}
    assert got == dict(conf)
    assert sum(got.values()) == len([v for v in vecs if v % similarity.KNN_CONFUSION_MOD == 0])


def test_sig_terms_gnd_recompute(spark, sf_dir):
    out = fulltext.sig_terms_gnd(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {int(r.doc_id): set(tokenize_string(r.text)) for r in docs.itertuples()}
    qterms = set(tokenize_string(fulltext.BOOLEAN_QUERY))
    hits = {d for d, ts in toks.items() if ts & qterms}
    n_fg, n_bg = len(hits), len(toks)
    df_fg, df_bg = Counter(), Counter()
    for d, ts in toks.items():
        for t in ts:
            df_bg[t] += 1
            if d in hits:
                df_fg[t] += 1
    rows = []
    for t, fgc in df_fg.items():
        if t in qterms or fgc < fulltext.SIGTERMS_MIN_DF:
            continue
        lf, ld, lo = math.log(n_fg), math.log(df_bg[t]), math.log(fgc)
        g = round((max(lf, ld) - lo) / (math.log(n_bg) - min(lf, ld)), 6)
        rows.append((g, t, fgc, df_bg[t]))
    rows.sort(key=lambda r: (r[0], r[1]))
    exp = rows[: fulltext.SIGTERMS_K]
    got = [
        (round(float(r.gnd), 6), r.term, int(r.df_fg), int(r.df_bg))
        for r in out.itertuples()
    ]
    assert got == exp
    # the planted 'dup' rare-but-lifted token family should score well
    # (gnd small when fg overlap ~ df); at minimum the list is non-empty
    assert len(got) == fulltext.SIGTERMS_K
