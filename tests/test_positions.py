"""Positional-postings sidecar (Lucene .pos parity): build, upsert masking,
merge/TTL propagation, and phrase/near verification from positions must agree
exactly with the stored-field verification path."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.index.merge import merge_all
from lucene_mapreduce_spark.query.wand import IndexSearcher


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def pos_index(spark, tmp_path):
    """Two generations, unmerged: doc 2 is re-indexed in batch 2 with the
    phrase REMOVED — positions of the stale copy must be masked."""
    ix = str(tmp_path / "ix")
    batch1 = _corpus(
        spark,
        [
            (0, "fast merge wins the race"),
            (1, "merge fast but not fast merge"),  # phrase at the tail
            (2, "fast merge here too"),  # will be shadowed without the phrase
            (3, "fast and merge far apart from fast"),
        ],
    )
    build_segment(
        spark, batch1, ix, num_partitions=4, store_fields=True,
        with_positions=True,
    )
    batch2 = _corpus(spark, [(2, "merge then much later a fast one")])
    build_segment(spark, batch2, ix, store_fields=True, with_positions=True)
    return ix


def test_phrase_positions_masks_stale_generation(spark, pos_index):
    s = IndexSearcher(pos_index)
    assert s.positions_available()
    got_pos = s.search_phrase("fast merge", use="positions")
    got_sto = s.search_phrase("fast merge", use="stored")
    assert list(got_pos) == [0, 1]
    assert list(got_pos) == list(got_sto)
    # auto prefers positions when every generation has the sidecar
    assert list(s.search_phrase("fast merge")) == [0, 1]


def test_near_positions_matches_stored(spark, pos_index):
    s = IndexSearcher(pos_index)
    for w in (2, 3, 4, 6):
        got_pos = s.search_near("fast merge", window=w, use="positions")
        got_sto = s.search_near("fast merge", window=w, use="stored")
        assert list(got_pos) == list(got_sto), f"window={w}"
    # window 2 == adjacency in either order: docs 0 and 1
    assert list(s.search_near("fast merge", window=2, use="positions")) == [0, 1]


def test_repeated_term_phrase(spark, tmp_path):
    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(
            spark,
            [
                (0, "merge merge conflict"),
                (1, "merge once then merge again"),
                (2, "a merge merge merge chain"),
            ],
        ),
        ix,
        num_partitions=4,
        store_fields=True,
        with_positions=True,
    )
    s = IndexSearcher(ix)
    for use in ("positions", "stored"):
        assert list(s.search_phrase("merge merge", use=use)) == [0, 2]
        assert list(s.search_phrase("merge merge merge", use=use)) == [2]


def test_positions_survive_merge_and_ttl(spark, pos_index):
    # merge: flag propagates, stale copies dropped from the sidecar
    merge_all(spark, pos_index)
    m = load_manifest(pos_index)
    assert len(m.ordered()) == 1 and m.ordered()[0].has_positions
    s = IndexSearcher(pos_index)
    assert list(s.search_phrase("fast merge", use="positions")) == [0, 1]
    # the merged sidecar holds only live rows: doc 2's stale text had
    # 'here' — it must be gone from positions entirely
    import os

    from lucene_mapreduce_spark.index.manifest import segment_dir

    seg = segment_dir(pos_index, m.ordered()[0].segment_id)
    pos = spark.read.parquet(os.path.join(seg, "positions"))
    assert pos.filter(F.col("term") == "here").count() == 0
    assert pos.filter((F.col("doc_id") == 2) & (F.col("term") == "later")).count() == 1

    # TTL purge: doc 0 expires; positions survive for the rest
    from lucene_mapreduce_spark.index.ttl import delete_docs

    delete_docs(spark, pos_index, [0])
    m2 = load_manifest(pos_index)
    assert m2.ordered()[0].has_positions
    s2 = IndexSearcher(pos_index)
    assert list(s2.search_phrase("fast merge", use="positions")) == [1]


def test_phrase_match_batch_identity(spark, pos_index):
    """The distributed phrase path must equal the serving path on the
    unmerged 2-generation fixture (live-copy masking included)."""
    from lucene_mapreduce_spark.query.segments import phrase_match

    s = IndexSearcher(pos_index)
    for q in ("fast merge", "fast merge wins", "merge fast"):
        got = [r["doc_id"] for r in phrase_match(spark, pos_index, q).collect()]
        want = list(s.search_phrase(q, use="positions"))
        assert got == want, q
    assert phrase_match(spark, pos_index, "").count() == 0


def test_phrase_match_batch_repeated_term(spark, tmp_path):
    from lucene_mapreduce_spark.query.segments import phrase_match

    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(spark, [(0, "merge merge go"), (1, "merge stop merge")]),
        ix,
        num_partitions=4,
        with_positions=True,
    )
    assert [r["doc_id"] for r in phrase_match(spark, ix, "merge merge").collect()] == [0]


def test_boolean_and_near_match_batch_identity(spark, pos_index):
    """Distributed boolean/proximity paths equal the serving path on the
    unmerged 2-generation fixture."""
    from lucene_mapreduce_spark.query.segments import boolean_match, near_match

    s = IndexSearcher(pos_index)
    for q in ("fast merge", "fast", "merge race"):
        got_and = [r["doc_id"] for r in boolean_match(spark, pos_index, q).collect()]
        assert got_and == list(s.search_boolean(q, mode="and")), f"and {q}"
        got_or = [
            r["doc_id"]
            for r in boolean_match(spark, pos_index, q, mode="or").collect()
        ]
        assert got_or == list(s.search_boolean(q, mode="or")), f"or {q}"
    for w in (2, 3, 5):
        got = [
            r["doc_id"]
            for r in near_match(spark, pos_index, "fast merge", window=w).collect()
        ]
        want = list(s.search_near("fast merge", window=w, use="positions"))
        assert got == want, f"window={w}"


def test_phrase_slop_semantics(spark, tmp_path):
    from lucene_mapreduce_spark.query.parse import parse_query_ext

    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(
            spark,
            [
                (0, "fast merge now"),            # exact
                (1, "fast x merge"),              # 1 gap
                (2, "fast x y merge"),            # 2 gaps
                (3, "merge then fast"),           # reversed — ordered slop: no
                (4, "fast alone and also merge fast merge"),  # exact at tail
            ],
        ),
        ix,
        num_partitions=4,
        store_fields=True,
        with_positions=True,
    )
    s = IndexSearcher(ix)
    # slop 0 == exact phrase
    assert list(s.search_phrase_slop("fast merge", 0)) == list(
        s.search_phrase("fast merge")
    )
    for use in ("positions", "stored"):
        assert list(s.search_phrase_slop("fast merge", 1, use=use)) == [0, 1, 4]
        assert list(s.search_phrase_slop("fast merge", 2, use=use)) == [0, 1, 2, 4]
    # reversed order never matches an ordered sloppy phrase
    assert 3 not in set(s.search_phrase_slop("fast merge", 5))
    # parser grammar + ext integration
    spec = parse_query_ext('now "fast merge"~2 -zzz')
    assert spec["sloppy_phrases"] == [(["fast", "merge"], 2)]
    assert spec["phrases"] == []
    hits = s.search_parsed_ext('"fast merge"~1 now', k=10)
    # candidates = the slop-1 hits; doc 0 ranks first (scores SHOULD 'now')
    assert [d for d, _ in hits] == [0, 1, 4]
    assert hits[0][1] > hits[1][1] == hits[2][1] == 0.0
    # ~0 routes to the exact-phrase clause list
    spec0 = parse_query_ext('"fast merge"~0')
    assert spec0["phrases"] == [["fast", "merge"]] and spec0["sloppy_phrases"] == []


def test_near_match_three_terms(spark, tmp_path):
    """Proximity with three terms: a window must contain ALL of them —
    pairwise closeness is not enough (doc 1: a-b close, b-c close, but no
    single 3-token window holds a, b, and c)."""
    from lucene_mapreduce_spark.query.segments import near_match

    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(
            spark,
            [
                (0, "alpha beta gamma end"),          # window 3 holds all
                (1, "alpha x beta x gamma"),          # pairwise only
                (2, "gamma beta alpha"),              # order-free
                (3, "alpha beta alpha beta"),         # missing gamma
            ],
        ),
        ix,
        num_partitions=4,
        store_fields=True,
        with_positions=True,
    )
    got = [
        r["doc_id"]
        for r in near_match(spark, ix, "alpha beta gamma", window=3).collect()
    ]
    assert got == [0, 2]
    s = IndexSearcher(ix)
    for w in (3, 5):
        assert [
            r["doc_id"]
            for r in near_match(spark, ix, "alpha beta gamma", window=w).collect()
        ] == list(s.search_near("alpha beta gamma", window=w, use="positions"))
        assert list(
            s.search_near("alpha beta gamma", window=w, use="positions")
        ) == list(s.search_near("alpha beta gamma", window=w, use="stored"))


def test_streaming_build_with_sidecars(spark, tmp_path):
    """Streamed segments can carry all three sidecars; phrase queries work
    on the streamed index and the flags survive the cadence merge."""
    import pandas as pd

    from lucene_mapreduce_spark.datagen.transcripts import transcripts_df
    from lucene_mapreduce_spark.streaming.incremental import (
        run_incremental_build,
    )

    src = str(tmp_path / "in")
    ix = str(tmp_path / "ix")
    ck = str(tmp_path / "ck")
    df = transcripts_df(spark, n_conv=12, seed=7).toPandas()
    for c in ("ts",):
        df[c] = df[c].astype("datetime64[us]")
    import os

    os.makedirs(src, exist_ok=True)
    df.to_parquet(src + "/batch0.parquet")
    n = run_incremental_build(
        spark, src, ix, ck, num_partitions=4, merge_when=1,
        store_fields=True, with_dict=True, with_positions=True,
        index_fields=["role"],
    )
    assert n == 1
    m = load_manifest(ix)
    seg = m.ordered()[0]
    assert seg.has_docstore and seg.has_dict and seg.has_positions
    assert seg.indexed_fields == ["role"]
    s = IndexSearcher(ix)
    assert s.positions_available()
    # a phrase from the generated vocabulary resolves through positions
    hits = s.search_phrase("tok00000", use="positions")
    assert len(hits) > 0
    # the streamed keyword field answers pure field queries
    roles = s.search_parsed_ext("role:user", k=1 << 20)
    assert len(roles) > 0


def test_auto_falls_back_without_sidecar(spark, tmp_path):
    ix = str(tmp_path / "ix")
    build_segment(
        spark,
        _corpus(spark, [(0, "fast merge plain")]),
        ix,
        num_partitions=4,
        store_fields=True,
    )
    s = IndexSearcher(ix)
    assert not s.positions_available()
    assert list(s.search_phrase("fast merge")) == [0]  # stored-field path


def test_positions_content_matches_tokenization(spark, tmp_path):
    """The sidecar's (term, positions) rows equal a direct tokenization."""
    ix = str(tmp_path / "ix")
    text = "alpha beta alpha gamma beta alpha"
    build_segment(
        spark, _corpus(spark, [(7, text)]), ix, num_partitions=4,
        with_positions=True,
    )
    import os

    from lucene_mapreduce_spark.index.manifest import segment_dir

    m = load_manifest(ix)
    seg = segment_dir(ix, m.ordered()[0].segment_id)
    rows = {
        r["term"]: list(r["positions"])
        for r in spark.read.parquet(os.path.join(seg, "positions")).collect()
    }
    assert rows == {"alpha": [0, 2, 5], "beta": [1, 4], "gamma": [3]}


def test_slop_match_batch_vs_serving(spark, tmp_path):
    """Distributed slop_match replays the serving path's greedy chaining
    exactly: 3-term phrases, repeated terms, and budget edge cases over a
    corpus designed to stress ordered-gap semantics."""
    from lucene_mapreduce_spark.query.segments import slop_match

    ix = str(tmp_path / "ix")
    corpus = _corpus(
        spark,
        [
            (0, "a b c"),                    # exact, span 2
            (1, "a x b c"),                  # a..c span 3 (one gap)
            (2, "a x x b x c"),              # span 5 (three gaps)
            (3, "c b a"),                    # wrong order
            (4, "a b x x x x c"),            # span 6
            (5, "b a b c"),                  # a(1) b(2) c(3): span 2
            (6, "a c b c"),                  # b after c: a(0) b(2) c(3) span 3
            (7, "a b"),                      # missing c
            (8, "a a a b c"),                # multiple starts, best is a(2)
        ],
    )
    build_segment(spark, corpus, ix, num_partitions=4, with_positions=True)
    s = IndexSearcher(ix)
    for slop in (0, 1, 2, 3, 4):
        serving = set(int(d) for d in s.search_phrase_slop("a b c", slop=slop))
        batch = {
            r["doc_id"] for r in slop_match(spark, ix, "a b c", slop).collect()
        }
        assert batch == serving, f"slop={slop}: {batch} vs {serving}"
    # repeated-term phrase: "b c b" needs two distinct b positions in order
    for slop in (0, 2):
        serving = set(int(d) for d in s.search_phrase_slop("b c b", slop=slop))
        batch = {
            r["doc_id"] for r in slop_match(spark, ix, "b c b", slop).collect()
        }
        assert batch == serving, f"b c b slop={slop}: {batch} vs {serving}"
