"""Tests: round-4 session-14 batch 51 — independent recomputes of the
Damerau-1 fuzzy expansion, conversation block rollup, shingle novelty,
numeric token profile, PCA power iteration, and the IVF balance audit."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, ivf, similarity, textstats


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_damerau_variants():
    assert "table" in fulltext.damerau1_transpositions("tabel")
    assert fulltext.damerau1_transpositions("aa") == []


def test_fuzzy_transpositions_expansion_hits_table(spark, sf_dir):
    out = fulltext.fuzzy_transpositions_query(spark, sf_dir).toPandas()
    # 'tabel' itself is not in the vocabulary; the page must be non-empty
    # and every returned doc must contain a term within OSA distance 1
    docs = _docs(sf_dir)
    q = fulltext.FUZZY_TRANS_QUERY
    variants = set(fulltext.damerau1_transpositions(q))

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    assert len(out) == 10
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for d in out["doc_id"]:
        ts = set(tokenize_string(texts[d]))
        assert any(lev(t, q) <= 1 or t in variants for t in ts)


def test_conversation_block_stats_recompute(spark, sf_dir):
    out = fulltext.conversation_block_stats(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    docs["conv_id"] = docs["doc_id"] // fulltext.BLOCK_WIDTH
    docs["toks"] = docs["text"].map(lambda t: len(tokenize_string(t)))
    g = docs.groupby("conv_id")
    exp = pd.DataFrame(
        {
            "n_turns": g.size(),
            "total_tokens": g["toks"].sum(),
            "total_chars": g["n_chars"].sum(),
        }
    ).reset_index()
    got = out.set_index("conv_id")
    for r in exp.itertuples():
        assert int(got.loc[r.conv_id, "n_turns"]) == r.n_turns
        assert int(got.loc[r.conv_id, "total_tokens"]) == r.total_tokens
        assert int(got.loc[r.conv_id, "total_chars"]) == r.total_chars
        assert (
            abs(
                got.loc[r.conv_id, "avg_turn_chars"]
                - round(r.total_chars / r.n_turns, 6)
            )
            < 1e-9
        )


def test_ngram_novelty_recompute(spark, sf_dir):
    out = textstats.ngram_novelty_by_source(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    k = textstats.NOVELTY_SHINGLE_K
    sh_by_doc = {}
    first = {}
    for r in docs.sort_values("doc_id").itertuples():
        ts = tokenize_string(r.text)
        if len(ts) < k:
            continue
        ss = {" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)}
        sh_by_doc[r.doc_id] = (r.source, ss)
        for s in ss:
            first.setdefault(s, r.doc_id)
    agg = {}
    for d, (src, ss) in sh_by_doc.items():
        novel = sum(1 for s in ss if first[s] == d)
        nov = round(novel / len(ss), 6)
        a = agg.setdefault(src, [0, 0, 0.0])
        a[0] += 1
        a[1] += len(ss)
        a[2] += nov
    got = out.set_index("source")
    for src, (nd, tot, novsum) in agg.items():
        assert int(got.loc[src, "n_docs"]) == nd
        assert int(got.loc[src, "total_shingles"]) == tot
        assert abs(got.loc[src, "mean_novelty"] - round(novsum / nd, 6)) < 2e-6


def test_numeric_token_profile_recompute(spark, sf_dir):
    out = textstats.numeric_token_profile(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    pat = re.compile(r"^[0-9]+$")
    rows = []
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        rows.append(
            {
                "source": r.source,
                "n_toks": len(ts),
                "n_num": sum(1 for t in ts if pat.match(t)),
            }
        )
    ref = pd.DataFrame(rows)
    got = out.set_index("source")
    for src, grp in ref.groupby("source"):
        assert int(got.loc[src, "total_tokens"]) == int(grp["n_toks"].sum())
        assert int(got.loc[src, "numeric_tokens"]) == int(grp["n_num"].sum())
        assert (
            abs(
                got.loc[src, "numeric_rate"]
                - round(grp["n_num"].sum() / grp["n_toks"].sum(), 6)
            )
            < 1e-9
        )


def test_pca_top_component_recompute(spark, sf_dir):
    # exact recompute of the SAME two-iteration chain (the synthetic
    # embeddings are near-isotropic — no eigengap — so convergence to the
    # true eigenvector is NOT the invariant; determinism of the pinned
    # 2-step power map is)
    out = similarity.pca_top_component(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.sort_values("vec_id")
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    n, d = X.shape
    mu = np.round(X, 12).sum(axis=0) / n
    Cm = X - mu
    w = np.full(d, 1.0 / d**0.5)
    for _ in range(2):
        y = np.round(Cm * w, 12).sum(axis=1)
        s = np.round(Cm * y[:, None], 12).sum(axis=0)
        nrm = math.sqrt(np.round(s * s, 12).sum())
        w = s / nrm
    got = out.sort_values("dim")
    assert list(got["dim"]) == list(range(d))
    for gw, ew in zip(got["loading"], w):
        assert abs(gw - round(ew, 6)) < 2e-6
    ev = float(got["eigenvalue"].iloc[0])
    assert abs(ev - round(nrm / n, 6)) < 2e-6
    # the Rayleigh estimate sits inside the covariance spectrum
    evals = np.linalg.eigvalsh(Cm.T @ Cm / n)
    assert evals[0] - 1e-6 <= ev <= evals[-1] + 1e-6


def test_ivf_balance_recompute(spark, sf_dir):
    out = ivf.ivf_balance_report(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n = len(emb)
    c = ivf.n_centroids(n)
    assert int(out["n_vectors"].sum()) == n
    assert len(out) <= c
    mean = n / c
    for r in out.itertuples():
        assert abs(r.share - round(r.n_vectors / n, 6)) < 1e-9
        assert abs(r.imbalance - round(r.n_vectors / mean, 6)) < 1e-9
