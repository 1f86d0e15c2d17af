"""Tests: round-4 session-15 batch 55 — independent recomputes of the
PQ distortion audit, curriculum buckets, repeat-exposure plan, split
stratification audit, JSD by source, and Cohen's kappa."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import similarity, textstats


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_pq_distortion_recompute(spark, sf_dir):
    out = similarity.pq_distortion_report(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    cents = {i: vecs[i] for i in range(1, similarity.PQ_K + 1)}
    sub = similarity.PQ_SUBDIM
    for m in range(similarity.PQ_M):
        errs = []
        used = set()
        for vid, v in vecs.items():
            best = None
            for cid in sorted(cents):
                d = 0.0
                for dim in range(m * sub, (m + 1) * sub):
                    d += (v[dim] - cents[cid][dim]) * (v[dim] - cents[cid][dim])
                d = round(d, 6)
                if best is None or d < best[0]:
                    best = (d, cid)
            errs.append(best[0])
            used.add(best[1])
        row = out[out["m"] == m].iloc[0]
        assert row["n_vecs"] == len(vecs)
        assert row["codewords_used"] == len(used)
        assert abs(row["avg_sq_err"] - round(sum(errs) / len(errs), 6)) < 1e-6
        assert abs(row["max_sq_err"] - max(errs)) < 1e-9
    # centroid vectors quantize to themselves: per-subspace error 0
    assert (out["avg_sq_err"] >= 0).all()


def test_curriculum_buckets_recompute(spark, sf_dir):
    out = textstats.curriculum_buckets(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per = []
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        if ts:
            per.append((len(ts), r.doc_id, len(set(ts))))
    per.sort()
    n = len(per)
    nb = textstats.CURRICULUM_BUCKETS
    # ntile semantics: first (n % nb) buckets get one extra row
    base, extra = divmod(n, nb)
    idx = 0
    for b in range(1, nb + 1):
        size = base + (1 if b <= extra else 0)
        chunk = per[idx : idx + size]
        idx += size
        row = out[out["bucket"] == b].iloc[0]
        assert row["n_docs"] == size
        assert row["min_dl"] == min(c[0] for c in chunk)
        assert row["max_dl"] == max(c[0] for c in chunk)
        assert row["total_tokens"] == sum(c[0] for c in chunk)
        ttrs = [round(c[2] / c[0], 12) for c in chunk]
        assert abs(row["avg_ttr"] - round(sum(ttrs) / size, 6)) < 1e-6
    # curriculum is monotone: bucket b's max_dl <= bucket b+1's min_dl
    assert (out["max_dl"].values[:-1] <= out["min_dl"].values[1:]).all()


def test_repeat_exposure_plan_recompute(spark, sf_dir):
    out = textstats.repeat_exposure_plan(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per: dict[str, int] = {}
    for r in docs.itertuples():
        per[r.source] = per.get(r.source, 0) + len(tokenize_string(r.text))
    z = sum(round(math.sqrt(t), 6) for t in per.values())
    tot = sum(per.values())
    budget = float(tot * textstats.EXPOSURE_BUDGET_MULT)
    for row in out.itertuples(index=False):
        w = round(round(math.sqrt(per[row.source]), 6) / z, 6)
        planned = math.floor(w * budget)
        assert row.n_tokens == per[row.source]
        assert abs(row.weight - w) < 1e-9
        assert row.planned_tokens == planned
        assert abs(row.epochs - round(planned / per[row.source], 6)) < 1e-9
    # floor never over-commits the budget
    assert out["planned_tokens"].sum() <= budget


def test_split_balance_audit_recompute(spark, sf_dir):
    out = textstats.split_balance_audit(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)

    def split_of(doc_id: int) -> str:
        b = int(hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:13], 16) % 100
        if b < textstats.SPLIT_PCTS[2]:
            return "test"
        if b < textstats.SPLIT_PCTS[2] + textstats.SPLIT_PCTS[1]:
            return "val"
        return "train"

    per: dict[tuple[str, str], int] = {}
    for r in docs.itertuples():
        k = (split_of(r.doc_id), r.lang)
        per[k] = per.get(k, 0) + 1
    n_all = sum(per.values())
    st = {}
    lt = {}
    for (s, l), n in per.items():
        st[s] = st.get(s, 0) + n
        lt[l] = lt.get(l, 0) + n
    for row in out.itertuples(index=False):
        n = per[(row.split, row.lang)]
        assert row.n_docs == n
        sf = n / st[row.split]
        gf = lt[row.lang] / n_all
        assert abs(row.split_frac - round(sf, 6)) < 1e-9
        assert abs(row.global_frac - round(gf, 6)) < 1e-9
        assert abs(row.abs_dev - round(abs(sf - gf), 6)) < 1e-9
    assert set(zip(out["split"], out["lang"])) == set(per)


def test_jsd_by_source_recompute(spark, sf_dir):
    out = textstats.jsd_by_source(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    per: dict[str, dict[str, int]] = {}
    corpus: dict[str, int] = {}
    for r in docs.itertuples():
        d = per.setdefault(r.source, {})
        for t in tokenize_string(r.text):
            d[t] = d.get(t, 0) + 1
            corpus[t] = corpus.get(t, 0) + 1
    tot = sum(corpus.values())
    for row in out.itertuples(index=False):
        cnts = per[row.source]
        tot_s = sum(cnts.values())
        # full-vocabulary JSD (the naive reference the closed form must equal)
        jsd = 0.0
        for t, cf in corpus.items():
            p = cnts.get(t, 0) / tot_s
            q = cf / tot
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            jsd += 0.5 * q * math.log(q / m)
        assert row.n_terms == len(cnts)
        assert abs(row.jsd_nats - jsd) < 1e-4
        assert 0.0 <= row.jsd_nats <= math.log(2.0) + 1e-9


def test_cohens_kappa_recompute(spark, sf_dir):
    out = textstats.cohens_kappa(spark, sf_dir).toPandas()
    conf = textstats.trigram_langid_confusion(spark, sf_dir).toPandas()
    n = conf["n_docs"].sum()
    n_agree = conf[conf["lang"] == conf["predicted"]]["n_docs"].sum()
    rows = conf.groupby("lang")["n_docs"].sum()
    cols = conf.groupby("predicted")["n_docs"].sum()
    pe_num = sum(
        rows[l] * cols[l] for l in rows.index if l in cols.index
    )
    po = n_agree / n
    pe = pe_num / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    row = out.iloc[0]
    assert row["n"] == n
    assert row["n_agree"] == n_agree
    assert abs(row["kappa"] - round(kappa, 6)) < 1e-9
    # trigram lang-ID beats chance agreement on this corpus (kappa > 0);
    # the synthetic sf0.001 vocabulary is shared across langs, so absolute
    # agreement is modest — the gate checks exactness, not classifier skill
    assert row["kappa"] > 0.0
