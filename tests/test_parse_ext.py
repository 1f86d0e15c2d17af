"""Extended-parser surface: boosts (term^w), keyword-field clauses
(field:value), and minimum_should_match — grammar and serving semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.query.parse import parse_query, parse_query_ext
from lucene_mapreduce_spark.query.wand import IndexSearcher


def test_parse_ext_grammar():
    spec = parse_query_ext('+table^2 -vector lang:en -source:src3 merge^0.5 "a b" scan')
    assert spec["must"] == ["table"]
    assert spec["must_not"] == ["vector"]
    assert spec["should"] == ["merge", "scan"]
    assert spec["phrases"] == [["a", "b"]]
    assert spec["boosts"] == {"table": 2.0, "merge": 0.5}
    assert spec["field_must"] == [("lang", "en")]
    assert spec["field_must_not"] == [("source", "src3")]


def test_parse_ext_degenerates_to_parse_query():
    """Without boosts/fields, the ext parse carries exactly the base parse."""
    q = '+must -not "fast merge" should stuff'
    must, must_not, phrases, should = parse_query(q)
    spec = parse_query_ext(q)
    assert (spec["must"], spec["must_not"], spec["phrases"], spec["should"]) == (
        must, must_not, phrases, should
    )
    assert spec["boosts"] == {} and spec["field_must"] == []


@pytest.fixture()
def field_ix(spark, tmp_path):
    ix = str(tmp_path / "ix")
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "merge scan alpha",
                "merge beta",
                "merge scan gamma",
                "scan delta",
            ],
            "lang": ["en", "en", "de", "en"],
            "source": ["web", "api", "web", "web"],
        }
    )
    build_segment(
        spark, spark.createDataFrame(pdf), ix, num_partitions=4,
        store_fields=True,
    )
    return ix


def test_field_clauses_filter_candidates(field_ix):
    s = IndexSearcher(field_ix)
    # lang:en keeps 0,1,3 of the merge/scan matches; -source:api drops 1
    ids = sorted(d for d, _ in s.search_parsed_ext("merge scan lang:en -source:api"))
    assert ids == [0, 3]
    ids = sorted(d for d, _ in s.search_parsed_ext("+merge lang:de"))
    assert ids == [2]
    # no doc matches lang:fr
    assert s.search_parsed_ext("merge lang:fr") == []


def test_boost_changes_ranking(field_ix):
    s = IndexSearcher(field_ix)
    plain = s.search_parsed_ext("merge scan")
    # scan is rarer (df 3 vs 4? merge df=3, scan df=3) — boost alpha-doc:
    # doc 3 has only scan; boosting scan must raise doc 3 relative rank
    boosted = s.search_parsed_ext("merge scan^10")
    rank_plain = [d for d, _ in plain].index(3)
    rank_boost = [d for d, _ in boosted].index(3)
    assert rank_boost <= rank_plain
    # boosted scores scale exactly: score(term^w) == w * score(term)
    one = dict(s.search_parsed_ext("scan"))
    ten = dict(s.search_parsed_ext("scan^10"))
    for d, sc in one.items():
        assert ten[d] == pytest.approx(10 * sc, rel=1e-12)


def test_min_should_match(field_ix):
    s = IndexSearcher(field_ix)
    # terms merge+scan: docs 0,2 match both; 1,3 match one
    both = sorted(d for d, _ in s.search_parsed_ext("merge scan", min_should_match=2))
    assert both == [0, 2]
    any_ = sorted(d for d, _ in s.search_parsed_ext("merge scan", min_should_match=1))
    assert any_ == [0, 1, 2, 3]
    assert s.search_parsed_ext("merge scan", min_should_match=3) == []


def test_ext_score_topk_matches_serving_randomized(spark, tmp_path):
    """The distributed weighted path (segments.ext_score_topk) must be
    doc- and score-identical to the serving path (search_parsed_ext) for
    randomized boosted / minimum_should_match queries — both implement the
    same canonical ascending-term accumulation."""
    import random

    from lucene_mapreduce_spark.datagen.transcripts import (
        transcripts_df,
        with_docid,
    )
    from lucene_mapreduce_spark.query.segments import ext_score_topk

    ix = str(tmp_path / "ix")
    corpus = with_docid(transcripts_df(spark, n_conv=40, seed=5)).select(
        "doc_id", "text"
    )
    build_segment(spark, corpus, ix, num_partitions=8)
    s = IndexSearcher(ix)
    vocab = ["tok00000", "tok00001", "tok00002", "tok00010", "tok00042",
             "tok00100", "tok01500", "missingtok"]
    rng = random.Random(11)
    for trial in range(8):
        terms = rng.sample(vocab, rng.randint(1, 4))
        weights = [round(rng.choice([0.5, 1.0, 2.0, 3.0]), 2) for _ in terms]
        msm = rng.randint(1, max(1, len(terms) - 1))
        q = " ".join(
            t if w == 1.0 else f"{t}^{w}" for t, w in zip(terms, weights)
        )
        serving = s.search_parsed_ext(q, k=10, min_should_match=msm)
        got = ext_score_topk(
            spark, ix, list(zip(terms, weights)), min_match=msm, k=10
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in serving], (q, msm)
        for r, (_, sc) in zip(got, serving):
            assert r["score"] == sc, (q, msm, r)
