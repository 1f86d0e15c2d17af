"""The north rule's named per-row invariant, as an explicit test: per-turn
text equality vs the source transcripts under stable (conv_id, turn_idx)
ordering, through a full index build + docstore read-back."""

from __future__ import annotations

import pytest

from lucene_mapreduce_spark.datagen.transcripts import (
    TURN_BITS,
    transcripts_df,
    with_docid,
)
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.query.fallback import lookup_join


@pytest.fixture(scope="module")
def stored_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("inv_ix"))
    full = with_docid(transcripts_df(spark, n_conv=50, seed=77)).cache()
    build_segment(
        spark, full.select("doc_id", "text"), ix, num_partitions=8,
        store_fields=True,
    )
    return ix, full


def test_per_turn_text_equality_under_stable_ordering(spark, stored_index):
    """Every (conv_id, turn_idx) turn's text survives tokenize-and-store
    byte-identically (incl. unicode / odd whitespace / empty rows), and
    the docid packing preserves the stable turn order: sorting by doc_id
    IS sorting by (conv_id, turn_idx)."""
    ix, full = stored_index
    src = full.select("conv_id", "turn_idx", "doc_id", "text").toPandas()
    back = lookup_join(spark, ix, full.select("doc_id")).toPandas()

    assert bool(back["hit"].all()), "every turn must resolve in the index"
    assert len(back) == len(src)

    merged = src.merge(back[["doc_id", "text"]], on="doc_id", suffixes=("", "_ix"))
    assert len(merged) == len(src)
    # per-turn text equality (null-safe: pandas NaN != NaN, so fillna)
    assert (
        merged["text"].fillna("\0") == merged["text_ix"].fillna("\0")
    ).all()

    # stable ordering: doc_id order == (conv_id, turn_idx) lexicographic
    by_docid = src.sort_values("doc_id", kind="mergesort")
    by_turn = src.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    assert list(by_docid["doc_id"]) == list(by_turn["doc_id"])
    assert list(by_docid["text"].fillna("")) == list(by_turn["text"].fillna(""))
    # and the packing is invertible
    assert (
        (by_docid["doc_id"] // (1 << TURN_BITS)).map(lambda c: f"conv_{c:08d}")
        == by_docid["conv_id"]
    ).all()
    assert (
        (by_docid["doc_id"] % (1 << TURN_BITS)) == by_docid["turn_idx"]
    ).all()
