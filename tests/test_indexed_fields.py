"""Indexed keyword fields (Lucene StringField analogue): build, upsert
masking, merge/TTL propagation, serving vs distributed identity, and pure
field queries with no text clause."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.index.merge import merge_all
from lucene_mapreduce_spark.query.segments import field_match
from lucene_mapreduce_spark.query.wand import IndexSearcher


def _corpus(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    )


@pytest.fixture()
def field_index(spark, tmp_path):
    """Two unmerged generations; doc 2's lang flips de->en in gen 2."""
    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(
            spark,
            [
                (0, "alpha beta", "en", "web"),
                (1, "alpha gamma", "de", "api"),
                (2, "beta delta", "de", "web"),
            ],
        ),
        ix,
        num_partitions=4,
        store_fields=True,
        index_fields=["lang", "source"],
    )
    build_segment(
        spark,
        _corpus(spark, [(2, "beta delta", "en", "web")]),
        ix,
        store_fields=True,
        index_fields=["lang", "source"],
    )
    return ix


def test_field_hits_latest_wins(spark, field_index):
    s = IndexSearcher(field_index)
    assert s.indexed_fields() == {"lang", "source"}
    assert list(s._field_hits("lang", "en")) == [0, 2]  # doc 2 flipped
    assert list(s._field_hits("lang", "de")) == [1]
    assert list(s._field_hits("lang", "fr")) == []
    # distributed twin agrees
    for v in ("en", "de", "fr"):
        got = [r["doc_id"] for r in field_match(spark, field_index, "lang", v).collect()]
        assert got == list(s._field_hits("lang", v)), v


def test_pure_field_query_through_parser(spark, field_index):
    s = IndexSearcher(field_index)
    hits = s.search_parsed_ext("lang:en", k=100)
    assert [d for d, _ in hits] == [0, 2]
    assert all(sc == 0.0 for _, sc in hits)  # constant-score clause
    # indexed MUST_NOT + indexed MUST compose
    assert [d for d, _ in s.search_parsed_ext("source:web -lang:de", k=100)] == [0, 2]
    # mixed: text term + indexed field
    assert [d for d, _ in s.search_parsed_ext("+beta lang:en", k=100)] == [0, 2]
    assert [d for d, _ in s.search_parsed_ext("+alpha lang:de", k=100)] == [1]


def test_fields_survive_merge_and_ttl(spark, field_index):
    merge_all(spark, field_index)
    m = load_manifest(field_index)
    assert m.ordered()[0].indexed_fields == ["lang", "source"]
    s = IndexSearcher(field_index)
    assert list(s._field_hits("lang", "en")) == [0, 2]
    # the stale de-copy of doc 2 must be gone from the sidecar rows
    import os

    from lucene_mapreduce_spark.index.manifest import segment_dir

    seg = segment_dir(field_index, m.ordered()[0].segment_id)
    rows = spark.read.parquet(os.path.join(seg, "fields"))
    assert rows.filter((F.col("doc_id") == 2) & (F.col("value") == "de")).count() == 0

    from lucene_mapreduce_spark.index.ttl import delete_docs

    delete_docs(spark, field_index, [0])
    m2 = load_manifest(field_index)
    assert m2.ordered()[0].indexed_fields == ["lang", "source"]
    assert list(IndexSearcher(field_index)._field_hits("lang", "en")) == [2]


def test_numeric_range_clauses(spark, tmp_path):
    from lucene_mapreduce_spark.query.parse import parse_query_ext
    from lucene_mapreduce_spark.query.segments import field_range_match

    spec = parse_query_ext("+merge n_chars:[100 TO 300] -size:[* TO 5] term")
    assert spec["range_must"] == [("n_chars", 100.0, 300.0)]
    assert spec["range_must_not"] == [("size", None, 5.0)]
    assert spec["must"] == ["merge"] and spec["should"] == ["term"]

    ix = str(tmp_path / "ix")
    rows = [
        (0, "alpha", "en", "10"),
        (1, "alpha", "en", "50"),
        (2, "alpha", "de", "100"),
        (3, "beta", "de", "200"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "size"])
    )
    build_segment(
        spark, corpus, ix, num_partitions=4, store_fields=True,
        index_fields=["lang", "size"],
    )
    s = IndexSearcher(ix)
    # inclusive bounds, open ends
    assert list(s._field_range_hits("size", 50, 100)) == [1, 2]
    assert list(s._field_range_hits("size", None, 50)) == [0, 1]
    assert list(s._field_range_hits("size", 150, None)) == [3]
    # through the parser: pure range, mixed with terms and MUST_NOT range
    assert [d for d, _ in s.search_parsed_ext("size:[50 TO 100]", k=10)] == [1, 2]
    assert [d for d, _ in s.search_parsed_ext("+alpha size:[* TO 60]", k=10)] == [0, 1]
    assert [d for d, _ in s.search_parsed_ext("alpha -size:[* TO 60]", k=10)] == [2]
    # distributed twin
    got = [r["doc_id"] for r in field_range_match(spark, ix, "size", 50, 100).collect()]
    assert got == [1, 2]
    # a string field has NULL num_value everywhere -> empty range hits
    assert list(s._field_range_hits("lang", 0, 1e9)) == []


def test_unindexed_field_falls_back_to_docstore(spark, tmp_path):
    """A field clause on a column that is stored but NOT indexed still
    works through the stored-field verification path."""
    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(spark, [(0, "alpha", "en", "web"), (1, "alpha", "de", "api")]),
        ix,
        num_partitions=4,
        store_fields=True,
        index_fields=["lang"],  # source stored but not indexed
    )
    s = IndexSearcher(ix)
    assert s.indexed_fields() == {"lang"}
    assert [d for d, _ in s.search_parsed_ext("alpha source:api", k=10)] == [1]
    # pure field query on an UNindexed field is refused, not wrong
    with pytest.raises(AssertionError):
        s.search_parsed_ext("source:api", k=10)
