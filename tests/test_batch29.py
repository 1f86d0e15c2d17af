"""Tests: round-4 session-11 batch 29 (Rocchio PRF, Bloom membership,
hash train/val/test split) — independent recomputes."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, textstats
from lucene_mapreduce_spark.query.bm25 import B, K1


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_rocchio_prf_recompute(spark, sf_dir):
    out = fulltext.rocchio_prf_topk(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def contrib(term, tf, dl, w):
        idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        return w * idf * tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * dl / avgdl)
        )

    def score(weights):
        scores = {}
        for d, t in toks.items():
            s = 0.0
            for term in sorted(weights):
                tf = t.count(term)
                if tf:
                    s += contrib(term, float(tf), float(len(t)), weights[term])
            if s:
                scores[d] = round(s, 6)
        return scores

    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    s1 = score({t: 1.0 for t in qts})
    fb = [
        d
        for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1], kv[0]))[
            : fulltext.PRF_FEEDBACK_K
        ]
    ]
    lift = {}
    for d in fb:
        for term in toks[d]:
            if term not in qts:
                lift[term] = lift.get(term, 0) + 1
    lift = {
        t: round(c * math.log(n / df[t]), 6) for t, c in lift.items()
    }
    exp = [
        t
        for t, _ in sorted(lift.items(), key=lambda kv: (-kv[1], kv[0]))[
            : fulltext.PRF_EXPANSION_N
        ]
    ]
    weights = {t: 1.0 for t in qts}
    weights.update({t: fulltext.PRF_EXP_WEIGHT for t in exp})
    s2 = score(weights)
    want = sorted(s2.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))
    # the expansion must actually change the ranking function's domain
    assert len(exp) == fulltext.PRF_EXPANSION_N


def test_bloom_membership_recompute(spark, sf_dir):
    out = textstats.bloom_filter_membership(spark, sf_dir).toPandas().iloc[0]
    docs = _docs(sf_dir)
    vocab = set()
    for t in docs[docs["lang"] == textstats.BLOOM_INSERT_LANG]["text"]:
        vocab.update(tokenize_string(t))
    m, kh = textstats.BLOOM_M, textstats.BLOOM_K
    bits = {
        _md5_52(f"{i}:{t}") % m for t in vocab for i in range(kh)
    }
    fps = sum(
        1
        for j in range(textstats.BLOOM_N_PROBES)
        if all(_md5_52(f"{i}:probe:{j}") % m in bits for i in range(kh))
    )
    assert int(out.n_inserted) == len(vocab)
    assert int(out.n_bits_set) == len(bits)
    assert int(out.n_probes) == textstats.BLOOM_N_PROBES
    assert int(out.n_false_pos) == fps
    assert abs(out.fp_rate - round(fps / textstats.BLOOM_N_PROBES, 6)) < 1e-9
    # theory check: realized fp within sanity band of (bits_set/m)^k
    theory = (len(bits) / m) ** kh
    assert out.fp_rate <= min(1.0, 4 * theory + 0.05)


def test_split_report_recompute(spark, sf_dir):
    out = textstats.train_val_test_split(spark, sf_dir).toPandas()
    docs = _docs(sf_dir)
    test_lt = textstats.SPLIT_PCTS[2]
    val_lt = test_lt + textstats.SPLIT_PCTS[1]

    def split(doc_id):
        b = _md5_52(f"{doc_id}:split") % 100
        return "test" if b < test_lt else ("val" if b < val_lt else "train")

    docs = docs.assign(split=[split(int(d)) for d in docs["doc_id"]])
    want = docs.groupby(["lang", "split"]).size()
    for r in out.itertuples():
        assert want[(r.lang, r.split)] == int(r.n_docs)
    assert out["n_docs"].sum() == len(docs)
    # train must dominate every language
    tr = out[out["split"] == "train"].set_index("lang")["frac"]
    assert (tr > 0.8).all()
