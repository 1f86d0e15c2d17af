"""Physical-plan regression tests: pushdown, pruning, broadcast.

These encode the scale contract: a change that silently stops a filter from
reaching the parquet scan, reads extra columns, or de-broadcasts a dimension
join fails here — long before it 10x's a 100 TB scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.datagen.transcripts import transcripts_df, with_docid
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.operators import parity
from lucene_mapreduce_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    read_schemas,
)


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("plan_ix"))
    corpus = with_docid(transcripts_df(spark, n_conv=30, seed=1)).select("doc_id", "text")
    build_segment(spark, corpus, ix, num_partitions=8)
    return ix


def test_segment_scan_prunes_partition_and_pushes_term(spark, small_index):
    import os

    from lucene_mapreduce_spark.index.manifest import load_manifest, segment_dir

    m = load_manifest(small_index)
    seg = m.segments[0].segment_id
    df = (
        spark.read.parquet(os.path.join(segment_dir(small_index, seg), "postings"))
        .filter((F.col("phash") == 3) & (F.col("term") == "tok00000"))
        .select("term", "payload")
    )
    # phash is a hive partition column => directory pruning, not a data filter
    pf = " ".join(partition_filters(df))
    assert "phash" in pf, f"phash not in PartitionFilters: {pf}"
    pushed = " ".join(pushed_filters(df))
    assert "term" in pushed, f"term not pushed to scan: {pushed}"


@pytest.fixture(scope="module")
def pos_plan_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("plan_pos_ix"))
    corpus = with_docid(transcripts_df(spark, n_conv=30, seed=1)).select(
        "doc_id", "text"
    )
    build_segment(spark, corpus, ix, num_partitions=8, with_positions=True)
    return ix


def test_phrase_match_plan_prunes_and_pushes(spark, pos_plan_index):
    """The distributed phrase plan must show phash directory pruning AND
    per-term row-group pushdown on every positions scan, with the array
    intersection in the (codegen) join — no UDF, no cartesian."""
    from lucene_mapreduce_spark.query.segments import near_match, phrase_match

    df = phrase_match(spark, pos_plan_index, "tok00000 tok00001")
    pf = " ".join(partition_filters(df))
    assert "phash" in pf, f"phash not in PartitionFilters: {pf}"
    pushed = " ".join(pushed_filters(df))
    assert "term" in pushed, f"term not pushed to positions scan: {pushed}"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "PythonUDF" not in plan

    near = near_match(spark, pos_plan_index, "tok00000 tok00001", window=3)
    pf2 = " ".join(partition_filters(near))
    assert "phash" in pf2


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = parity.distinct_projection(spark, sf_dir)
    schemas = read_schemas(df)
    assert schemas, "no scan found"
    assert all("value" not in s and "props" not in s for s in schemas), schemas


def test_dimension_join_broadcasts(spark, sf_dir):
    assert has_broadcast_join(parity.index_lookup_join(spark, sf_dir))
    assert has_broadcast_join(parity.index_lookup_join_with_misses(spark, sf_dir))


def test_filter_pushdown_events(spark, sf_dir):
    df = parity.dictionary_filter(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "event_type" in pushed, pushed


def test_bm25_scan_plan_shape(spark, sf_dir):
    from lucene_mapreduce_spark.operators.fulltext import bm25_topk_documents

    df = bm25_topk_documents(spark, sf_dir)
    plan = explain_str(df)
    # the tiny sides (query terms, df_t, stats) must broadcast — the corpus
    # must never shuffle by term for scoring
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2, plan[:2000]


def test_ttl_anti_join_is_broadcast_anti(spark, sf_dir):
    df = parity.ttl_anti_join(spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan[:1500]
    # expired set is small => broadcast anti-join, no full shuffle
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_similarity_plans_have_no_cartesian(spark, sf_dir):
    """The LSH paths must candidate-generate via key-equality joins — a
    regression to all-pairs shows up as a Cartesian/NestedLoop join over
    the full table (ann's single-row query broadcast is exempt)."""
    from lucene_mapreduce_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    plan = explain_str(embedding_near_dup_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    # the band self-join is an equi-join
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_ann_lsh_probe_is_bucket_join(spark, sf_dir):
    """Candidate generation = broadcast semi-join on (table, sig) probe
    keys; the exact rescore touches only bucket members."""
    from lucene_mapreduce_spark.operators.similarity import ann_lsh_topk

    plan = explain_str(ann_lsh_topk(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_batch_query_broadcast_join_path(spark, small_index):
    """Above the pushdown cap, the term plan must be a broadcast join with
    NO driver-side term list (no isin/In filter on term) — and the doclen
    pseudo partition must be excluded at the scan."""
    from lucene_mapreduce_spark.query.segments import bm25_index_topk

    queries = spark.range(50).selectExpr(
        "concat('q', id) AS query_id",
        "concat('tok', lpad(cast(id AS string), 5, '0')) AS query_text",
    )
    df = bm25_index_topk(spark, small_index, queries, max_pushdown_terms=10)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    pushed = " ".join(pushed_filters(df))
    assert "term," not in pushed and "In(term" not in pushed, pushed
    pf = " ".join(partition_filters(df))
    assert "phash" in pf, pf  # pseudo-partition exclusion prunes directories


def test_ann_single_query_rankers_take_ordered(spark, sf_dir):
    """Single-query ANN top-k must rank via TakeOrderedAndProject (per-
    partition heaps), never a single-partition window over the scored
    corpus — the row_number window may only see the k survivors."""
    from lucene_mapreduce_spark.operators.ivf import ann_ivf_topk
    from lucene_mapreduce_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_lsh_topk,
    )

    for df in (
        ann_bruteforce_topk(spark, sf_dir, k=5),
        ann_lsh_topk(spark, sf_dir, k=5),
        ann_ivf_topk(spark, sf_dir, k=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan[:2000]
