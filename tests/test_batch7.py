"""Tests: round-3 session-5 operators (LM Jelinek-Mercer / boosting query /
span-within / top-hits facet / matched_queries / random_score / gauss
decay) — invariants beyond the DuckDB oracle gate."""

from __future__ import annotations

import math

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_lmjelinekmercer_exact_scores(spark, sf_dir):
    lam = fulltext.LMJM_LAMBDA
    out = fulltext.lmjelinekmercer_topk(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    toks = {int(r.doc_id): tokenize_string(r.text) for r in docs.itertuples()}
    total = float(sum(len(t) for t in toks.values()))
    qts = sorted(set(tokenize_string(fulltext.FLAGSHIP_QUERY)))
    cf = {q: float(sum(t.count(q) for t in toks.values())) for q in qts}
    exp = {}
    for d, ts in toks.items():
        s = 0.0
        for q in qts:  # canonical ascending-term order
            tf = ts.count(q)
            if tf:
                s += math.log(
                    1.0 + ((1.0 - lam) * tf / len(ts)) / (lam * (cf[q] / total))
                )
        if s > 0:
            exp[d] = round(s, 6)
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.doc_id, r.score) for r in out.itertuples()] == ranked
    assert (out["score"] > 0).all()  # JM contributions are never negative


def test_boosting_demotes_but_keeps(spark, sf_dir):
    neg, nb = fulltext.BOOSTING_NEG
    plain = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=10_000
    ).toPandas()
    boosted = fulltext.boosting_query(spark, sf_dir, k=10_000).toPandas()
    # same doc set: demotion never drops a hit
    assert set(plain["doc_id"]) == set(boosted["doc_id"])
    docs = _corpus(sf_dir)
    has_neg = {
        int(r.doc_id)
        for r in docs.itertuples()
        if neg in tokenize_string(r.text)
    }
    p = plain.set_index("doc_id")["score"]
    b = boosted.set_index("doc_id")["score"]
    flipped = 0
    for d in b.index:
        if d in has_neg:
            # boosting multiplies the UNROUNDED bm25 score then rounds;
            # p[d] is already 6dp-rounded, so allow one ulp of 6dp
            assert abs(b[d] - p[d] * nb) <= 1e-6
            flipped += 1
        else:
            assert b[d] == p[d]
    assert flipped > 0  # the negative clause actually intersects the hits


def test_span_within_membership(spark, sf_dir):
    a, bb, dist, c = fulltext.SPAN_WITHIN
    out = fulltext.span_within_query(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    exp = set()
    for r in docs.itertuples():
        ts = tokenize_string(r.text)
        pa = [i for i, t in enumerate(ts) if t == a]
        pb = [i for i, t in enumerate(ts) if t == bb]
        pc = [i for i, t in enumerate(ts) if t == c]
        if any(
            abs(i - j) <= dist and any(min(i, j) <= p <= max(i, j) for p in pc)
            for i in pa
            for j in pb
        ):
            exp.add(int(r.doc_id))
    assert set(out["doc_id"]) == exp and len(exp) > 0


def test_top_hits_per_bucket_shape(spark, sf_dir):
    out = fulltext.top_hits_facets(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    langs = set(docs["lang"])
    # every bucket contributes at most per_bucket rows, ranks 1..n dense
    for lang, grp in out.groupby("lang"):
        assert lang in langs
        assert len(grp) <= fulltext.TOP_HITS_PER_LANG
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
        assert (
            grp.sort_values("rank")["score"].is_monotonic_decreasing
            or len(grp) == 1
        )
    # global top-1 appears as rank 1 of its own lang
    top = fulltext.bm25_index_topk_documents(spark, sf_dir, k=1).toPandas()
    d0 = int(top["doc_id"].iloc[0])
    lang0 = docs.set_index("doc_id").loc[d0, "lang"]
    r = out[(out["lang"] == lang0) & (out["rank"] == 1)]
    assert int(r["doc_id"].iloc[0]) == d0


def test_matched_queries_names(spark, sf_dir):
    out = fulltext.matched_queries(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    needs = {
        name: set(tokenize_string(q)) for name, q in fulltext.MATCHED_CLAUSES
    }
    exp = {}
    for r in docs.itertuples():
        ts = set(tokenize_string(r.text))
        names = sorted(n for n, need in needs.items() if need <= ts)
        if names:
            exp[int(r.doc_id)] = ",".join(names)
    assert dict(zip(out["doc_id"], out["matched"])) == exp
    # at least one doc matches more than one named clause
    assert any("," in m for m in out["matched"])


def test_random_score_deterministic_and_uniform(spark, sf_dir):
    out1 = fulltext.random_score_query(spark, sf_dir).toPandas()
    out2 = fulltext.random_score_query(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(out1, out2)  # same seed -> same ranking
    other = fulltext.random_score_query(spark, sf_dir, seed="s8").toPandas()
    assert list(out1["doc_id"]) != list(other["doc_id"])  # seed matters
    assert ((out1["score"] >= 0) & (out1["score"] < 1)).all()


def test_decay_halves_at_scale_distance(spark, sf_dir):
    origin, scale, decay = fulltext.DECAY_PARAMS
    base = fulltext.bm25_index_topk_documents(
        spark, sf_dir, k=10_000
    ).toPandas()
    out = fulltext.decay_function_score(spark, sf_dir, k=10_000).toPandas()
    docs = _corpus(sf_dir).set_index("doc_id")
    p = base.set_index("doc_id")["score"]
    ln_d = math.log(decay)
    for r in out.itertuples():
        x = float(docs.loc[r.doc_id, "n_chars"])
        mult = math.exp(ln_d * (x - origin) ** 2 / (scale * scale))
        assert abs(r.score - p[r.doc_id] * mult) < 2e-6
    # a doc exactly `scale` chars from origin would score exactly half;
    # check the multiplier is strictly within (0, 1] and ordering changed
    assert list(out["doc_id"]) != list(base["doc_id"])
