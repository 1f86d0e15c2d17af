"""Tests: round-3 session-5 batch 2 (streaming percolator / multi-fragment
highlighting / phrase suggester / ANN recall audit) — invariants beyond
the DuckDB oracle gate."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from lucene_mapreduce_spark.functions.tokenize import tokenize_string
from lucene_mapreduce_spark.operators import fulltext, similarity


def _corpus(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_streaming_percolate_equals_batch(spark, sf_dir):
    from lucene_mapreduce_spark.streaming.incremental import streaming_percolate

    stream = streaming_percolate(spark, sf_dir).toPandas()
    batch = fulltext.percolate_match(spark, sf_dir).toPandas()
    a = {(r.query_id, r.doc_id) for r in stream.itertuples()}
    b = {(r.query_id, r.doc_id) for r in batch.itertuples()}
    assert a == b and len(a) > 0


def test_highlight_every_occurrence(spark, sf_dir):
    out = fulltext.highlight_all_fragments(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir).set_index("doc_id")
    qts = set(tokenize_string(fulltext.FLAGSHIP_QUERY))
    assert out["doc_id"].nunique() == fulltext.HIGHLIGHT_K
    for doc_id, grp in out.groupby("doc_id"):
        ts = tokenize_string(docs.loc[doc_id, "text"])
        occ = [i for i, t in enumerate(ts) if t in qts]
        assert sorted(grp["pos"]) == occ  # one fragment per occurrence
        for r in grp.itertuples():
            assert ts[r.pos] in qts
            w = fulltext.SNIPPET_WIDTH
            start = max(0, r.pos - w)
            assert r.snippet == " ".join(ts[start : start + 2 * w + 1])


def test_phrase_suggest_bigram_ranking(spark, sf_dir):
    out = fulltext.phrase_suggest(spark, sf_dir).toPandas()
    docs = _corpus(sf_dir)
    bigrams = Counter()
    for txt in docs["text"]:
        ts = tokenize_string(txt)
        bigrams.update(zip(ts, ts[1:]))
    # recompute candidates with a pure-python levenshtein
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    w1, w2 = fulltext.PHRASE_SUGGEST_INPUT
    vocab = {t for txt in docs["text"] for t in tokenize_string(txt)}
    c1 = {t for t in vocab if lev(t, w1) <= 2}
    c2 = {t for t in vocab if lev(t, w2) <= 2}
    exp = sorted(
        (
            (t1, t2, n)
            for (t1, t2), n in bigrams.items()
            if t1 in c1 and t2 in c2
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:5]
    assert [(r.t1, r.t2, r.n) for r in out.itertuples()] == exp
    assert len(out) >= 2  # the gate input must exercise the ranking


def test_ann_recall_matches_leg_intersection(spark, sf_dir):
    out = similarity.ann_recall_at_k(spark, sf_dir).toPandas()
    from lucene_mapreduce_spark.operators.ivf import ann_ivf_batch_topk

    brute = similarity.ann_batch_topk(spark, sf_dir).toPandas()
    ivf = ann_ivf_batch_topk(spark, sf_dir).toPandas()
    b = {(r.query_id, r.vec_id) for r in brute.itertuples()}
    i = {(r.query_id, r.vec_id) for r in ivf.itertuples()}
    exp = Counter(q for (q, v) in (b & i))
    assert len(out) == brute["query_id"].nunique()
    for r in out.itertuples():
        assert r.n_hits == exp.get(r.query_id, 0)
        assert abs(r.recall - r.n_hits / 5.0) < 1e-9
    # the probe path should find most of the true neighbours
    assert out["recall"].mean() >= 0.5
