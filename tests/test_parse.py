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


def test_search_parsed_multigeneration_latest_wins(spark, tmp_path):
    """Parsed queries serve unmerged 2-generation indexes: an update that
    removes the must-term must drop the doc; a new doc must appear."""
    sf = str(tmp_path)
    ix = sf + "/ix"
    gen1 = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["apple banana cherry", "apple fig"]}
        )
    )
    build_segment(spark, gen1, ix, num_partitions=4, store_fields=True)
    gen2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["grape melon", "apple banana cherry date"],
            }
        )
    )
    build_segment(spark, gen2, ix, store_fields=True)  # unmerged, 2 gens

    s = IndexSearcher(ix)
    ids = [d for d, _ in s.search_parsed('+apple "banana cherry"')]
    # doc 1 lost 'apple' in gen2 (latest wins); doc 2 is new
    assert sorted(ids) == [0, 2]


def test_search_parsed_empty_and_missing(parsed_ix):
    s = IndexSearcher(parsed_ix)
    assert s.search_parsed("") == []
    assert s.search_parsed("+zzz_missing apple") == []
    assert s.search_parsed('-apple "fig grape"') == [(5, 0.0)]
