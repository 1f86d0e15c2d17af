"""Lucene-style query parser + search_parsed clause semantics."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.query.parse import parse_query
from lucene_mapreduce_spark.query.wand import IndexSearcher


def test_parse_query_grammar():
    must, nots, phrases, should = parse_query('+table -vector "fast merge" scan query')
    assert must == ["table"]
    assert nots == ["vector"]
    assert phrases == [["fast", "merge"]]
    assert should == ["query", "scan"]
    # empty phrase dropped; dedup; bare +/- kept as literal tokens
    must2, nots2, phrases2, should2 = parse_query('"" a a + - +x')
    assert (must2, nots2, phrases2, should2) == (["x"], [], [], ["+", "-", "a"])


@pytest.fixture(scope="module")
def parsed_ix(spark, tmp_path_factory):
    texts = {
        0: "apple banana cherry",
        1: "apple cherry banana",        # phrase 'banana cherry' NOT here
        2: "apple banana cherry date",
        3: "banana cherry elderberry",   # no apple
        4: "apple banana cherry poison", # excluded by -poison
        5: "fig grape",                  # matches nothing
    }
    sf = str(tmp_path_factory.mktemp("parse"))
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}).to_parquet(
        os.path.join(sf, "documents.parquet")
    )
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    ix = sf + "/ix"
    build_segment(spark, corpus, ix, num_partitions=4, store_fields=True)
    return ix


def test_search_parsed_clause_interplay(parsed_ix):
    s = IndexSearcher(parsed_ix)
    hits = s.search_parsed('+apple -poison "banana cherry"')
    ids = [d for d, _ in hits]
    # candidates: apple AND phrase(banana cherry) AND NOT poison = {0, 2}
    assert sorted(ids) == [0, 2]
    # scoring terms = {apple}: doc 0 (dl 3) outranks doc 2 (dl 4)
    assert ids == [0, 2]
    assert hits[0][1] > hits[1][1] > 0


def test_search_parsed_phrase_only_constant_score(parsed_ix):
    s = IndexSearcher(parsed_ix)
    hits = s.search_parsed('"banana cherry"')
    # no scoring terms -> constant score 0.0, ranked by doc_id asc
    assert [d for d, _ in hits] == [0, 2, 3, 4]
    assert all(sc == 0.0 for _, sc in hits)


def test_search_parsed_should_only_equals_bm25(parsed_ix):
    s = IndexSearcher(parsed_ix)
    assert s.search_parsed("apple banana") == s.search("apple banana", k=10)


def test_search_parsed_empty_and_missing(parsed_ix):
    s = IndexSearcher(parsed_ix)
    assert s.search_parsed("") == []
    assert s.search_parsed("+zzz_missing apple") == []
    assert s.search_parsed('-apple "fig grape"') == [(5, 0.0)]
