"""Docid-range-scoped search: chunk pruning reaches the scan, and the
range-scoped result equals a standalone index built from only that range."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.datagen.transcripts import transcripts_df, with_docid
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.merge import merge_all
from lucene_mapreduce_spark.plans.inspect import pushed_filters
from lucene_mapreduce_spark.query.segments import bm25_range_topk


@pytest.fixture(scope="module")
def range_corpus(spark, tmp_path_factory):
    """One merged index over 200 conversations, plus the corpus frame."""
    base = tmp_path_factory.mktemp("range_ix")
    corpus = with_docid(transcripts_df(spark, n_conv=200, seed=31)).select(
        "doc_id", "text"
    )
    ix = str(base / "full")
    build_segment(spark, corpus, ix, num_partitions=8, chunk_docs=1 << 12)
    merge_all(spark, ix)
    return ix, corpus, str(base)


def _q(spark, text="tok00000 tok00001 tok00003"):
    return spark.createDataFrame(
        [("q0", text)], "query_id string, query_text string"
    )


def test_range_equals_standalone_subindex(spark, range_corpus):
    """bm25_range_topk over [lo, hi) must return exactly what an index
    built from only that docid span returns (stats are range-scoped)."""
    ix, corpus, base = range_corpus
    lo, hi = 50 << 20, 120 << 20  # conversations 50..119
    sub_ix = base + "/sub"
    build_segment(
        spark,
        corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
        sub_ix,
        num_partitions=8,
        chunk_docs=1 << 12,
    )
    got = bm25_range_topk(spark, ix, _q(spark), lo, hi, k=10, round_to=6)
    want = __import__(
        "lucene_mapreduce_spark.query.segments", fromlist=["x"]
    ).bm25_index_topk(spark, sub_ix, _q(spark), k=10, round_to=6)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_range_chunk_filter_reaches_scan(spark, range_corpus):
    ix, _, _ = range_corpus
    lo, hi = 50 << 20, 120 << 20
    df = bm25_range_topk(spark, ix, _q(spark), lo, hi, k=10)
    pushed = " ".join(pushed_filters(df))
    assert "chunk" in pushed, f"chunk range not pushed to scan: {pushed}"


def test_more_like_this_finds_near_copy(spark, tmp_path):
    """A near-copy of the source doc must rank first, and the source doc
    itself must be excluded from the results."""
    import pandas as pd

    from lucene_mapreduce_spark.query.segments import more_like_this

    texts = {
        0: "quantum flux capacitor resonance chamber alpha beta",
        1: "quantum flux capacitor resonance chamber alpha gamma",  # near-copy
        2: "unrelated cooking recipe with flour sugar butter",
        3: "another unrelated text about gardening tulips roses",
        4: "quantum mechanics textbook chapter one",
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[d] for d in texts]}
    )
    sf = str(tmp_path)
    pdf.to_parquet(sf + "/documents.parquet")
    corpus = spark.createDataFrame(pdf)
    ix = sf + "/ix"
    build_segment(spark, corpus, ix, num_partitions=4, store_fields=True)

    out = more_like_this(spark, ix, 0, k=3).collect()
    assert out[0]["doc_id"] == 1
    assert all(r["doc_id"] != 0 for r in out)


def test_fuzzy_and_prefix_query_semantics(spark, tmp_path):
    import pandas as pd

    from lucene_mapreduce_spark.operators.fulltext import (
        bm25_index_topk_documents,
        fuzzy_query,
        prefix_query,
    )

    texts = {
        0: "merge conflict resolved",
        1: "marge simpson episode",   # dist 1 from 'merge'
        2: "merge merge merge",
        3: "emerge from water",       # dist 1 (one insertion)
        4: "mercy rule applied",      # prefix 'mer', dist 2 from merge
    }
    sf = str(tmp_path)
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}).to_parquet(
        sf + "/documents.parquet"
    )
    fz = fuzzy_query(spark, sf, query_text="merge").collect()
    assert {r["doc_id"] for r in fz} == {0, 1, 2, 3}
    # dist 0 degenerates to the exact BM25 query — full identity
    exact = bm25_index_topk_documents(spark, sf, "merge").collect()
    fz0 = fuzzy_query(spark, sf, query_text="merge", max_dist=0).collect()
    assert [tuple(r) for r in fz0] == [tuple(r) for r in exact]
    # no dictionary term within distance 1 -> empty with the right schema
    assert fuzzy_query(spark, sf, query_text="zzzzzzz").count() == 0

    pf = prefix_query(spark, sf, prefix="mer").collect()
    assert {r["doc_id"] for r in pf} == {0, 2, 4}  # merge, mercy
    assert prefix_query(spark, sf, prefix="zzz").count() == 0


def test_wildcard_regexp_and_term_range_semantics(spark, tmp_path):
    import pandas as pd

    from lucene_mapreduce_spark.operators.fulltext import (
        bm25_index_topk_documents,
        regexp_query,
        term_range_query,
        wildcard_query,
        wildcard_to_regex,
    )

    texts = {
        0: "merge conflict resolved",
        1: "marge simpson episode",
        2: "moose in the garden",
        3: "mergers and acquisitions",
        4: "zebra crossing ahead",
    }
    sf = str(tmp_path)
    pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())}).to_parquet(
        sf + "/documents.parquet"
    )
    # ? is exactly one char; * any run (incl. empty). m?rge: merge, marge
    wc = wildcard_query(spark, sf, pattern="m?rge").collect()
    assert {r["doc_id"] for r in wc} == {0, 1}
    # m*e full-match: merge, marge, moose — NOT mergers (trailing 'rs')
    wc2 = wildcard_query(spark, sf, pattern="m*e").collect()
    assert {r["doc_id"] for r in wc2} == {0, 1, 2}
    # a pattern with no wildcard degenerates to the exact term query
    exact = bm25_index_topk_documents(spark, sf, "merge").collect()
    wc3 = wildcard_query(spark, sf, pattern="merge").collect()
    assert [tuple(r) for r in wc3] == [tuple(r) for r in exact]
    assert wildcard_query(spark, sf, pattern="zz*").count() == 0
    # regex metachars in the literal part are escaped, not interpreted
    assert wildcard_to_regex("a.b*") == "^a\\.b.*$"

    # RegexpQuery is full-match: 'merge(rs)?' hits merge + mergers only
    rx = regexp_query(spark, sf, pattern="m[ae]rge(rs)?").collect()
    assert {r["doc_id"] for r in rx} == {0, 1, 3}
    assert regexp_query(spark, sf, pattern="erge").count() == 0  # not substring

    # TermRangeQuery: lexicographic inclusive — 'mergers' > 'merge', so the
    # [marge, merge] range excludes it; [merge, moose] picks it back up
    tr = term_range_query(spark, sf, lo="marge", hi="merge").collect()
    assert {r["doc_id"] for r in tr} == {0, 1}  # marge, merge
    tr2 = term_range_query(spark, sf, lo="merge", hi="moose").collect()
    assert {r["doc_id"] for r in tr2} == {0, 2, 3}  # merge, mergers, moose
    assert term_range_query(spark, sf, lo="zz", hi="zzz").count() == 0


def test_range_boundary_and_empty(spark, range_corpus):
    ix, corpus, _ = range_corpus
    # a range covering everything == the unscoped result set size
    full = bm25_range_topk(spark, ix, _q(spark), 0, 1 << 62, k=10, round_to=6)
    assert full.count() == 10
    # an empty docid span yields zero rows with the right schema
    empty = bm25_range_topk(spark, ix, _q(spark), 1 << 40, (1 << 40) + 1, k=10)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "query_id", "doc_id", "score", "rank",
    ]
