"""Tests: round-4 session-15 batch 57 — IVF-PQ composite ANN, the
Poisson-bootstrap CI, and the per-source dataset card."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import ivf, similarity, textstats


def test_ann_ivf_pq_candidates_come_from_probed_lists(spark, sf_dir):
    out = ivf.ann_ivf_pq_topk(spark, sf_dir).toPandas()
    cents = ivf._centroids(spark, sf_dir)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    qv = [float(x) for x in vecs[similarity.QUERY_VEC_ID]]
    probes = set(ivf._probe_lists(qv, cents, ivf.N_PROBE))

    def fold_cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        if na == 0 or nb == 0:
            return -2.0
        return dot / (na**0.5 * nb**0.5)

    def assign(v):
        best = None
        for cid, cv in cents:
            c = fold_cos(v, cv)
            if best is None or c > best[0] or (c == best[0] and cid < best[1]):
                best = (c, cid)
        return best[1]

    assert len(out) == 10
    for vid in out["vec_id"]:
        assert assign(vecs[vid]) in probes
        assert vid != similarity.QUERY_VEC_ID
    # ADC distances are sorted ascending with rank 1..10
    assert list(out["rank"]) == list(range(1, 11))
    assert list(out["approx_dist"]) == sorted(out["approx_dist"])
    # IVF-PQ ranks approximate: its top-1 should appear in the exact
    # brute-force cosine page (sanity, not equality — PQ is lossy)
    brute = similarity.ann_bruteforce_topk(spark, sf_dir).toPandas()
    assert len(set(out["vec_id"]) & set(brute["vec_id"])) >= 1


def test_poisson_bootstrap_recompute(spark, sf_dir):
    out = textstats.poisson_bootstrap_ci(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    dls = {r.doc_id: len(tokenize_string(r.text)) for r in docs.itertuples()}
    cdf = textstats._POIS1_CDF

    def weight(doc_id, b):
        u = (
            int(hashlib.md5(f"{doc_id}:boot:{b}".encode()).hexdigest()[:13], 16)
            / 4503599627370496.0
        )
        for k, t in enumerate(cdf):
            if u < t:
                return k
        return 5

    means = []
    for b in range(textstats.BOOTSTRAP_B):
        sw = swdl = 0
        for d, dl in dls.items():
            w = weight(d, b)
            sw += w
            swdl += w * dl
        means.append(round(swdl / sw, 6))
    means.sort()
    row = out.iloc[0]
    assert row["n_docs"] == len(dls)
    assert abs(row["mean_dl"] - round(sum(dls.values()) / len(dls), 6)) < 1e-9
    assert row["b_replicas"] == textstats.BOOTSTRAP_B

    def q7(xs, p):
        h = (len(xs) - 1) * p
        lo = int(h)
        hi = min(lo + 1, len(xs) - 1)
        return xs[lo] + (h - lo) * (xs[hi] - xs[lo])

    assert abs(row["ci_lo"] - round(q7(means, 0.025), 6)) < 1e-6
    assert abs(row["ci_mid"] - round(q7(means, 0.5), 6)) < 1e-6
    assert abs(row["ci_hi"] - round(q7(means, 0.975), 6)) < 1e-6
    # the CI brackets the point estimate
    assert row["ci_lo"] <= row["mean_dl"] <= row["ci_hi"]


def test_dataset_card_recompute(spark, sf_dir):
    out = textstats.dataset_card_report(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    text_counts = docs["text"].value_counts()
    per: dict[str, dict] = {}
    for r in docs.itertuples():
        d = per.setdefault(
            r.source,
            {"n": 0, "tok": 0, "langs": set(), "dup": 0, "chars": 0},
        )
        d["n"] += 1
        d["tok"] += len(tokenize_string(r.text))
        d["langs"].add(r.lang)
        d["chars"] += r.n_chars
        if text_counts[r.text] > 1:
            d["dup"] += 1
    for row in out.itertuples(index=False):
        d = per[row.source]
        assert row.n_docs == d["n"]
        assert row.n_tokens == d["tok"]
        assert row.n_langs == len(d["langs"])
        assert row.n_dup_docs == d["dup"]
        assert abs(row.dup_frac - round(d["dup"] / d["n"], 6)) < 1e-9
        assert abs(row.avg_chars - round(d["chars"] / d["n"], 6)) < 1e-9
    assert set(out["source"]) == set(per)
