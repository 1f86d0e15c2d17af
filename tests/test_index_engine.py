"""End-to-end index engine tests: build, upsert, merge, resume, query.

The rank-identity chain: pandas oracle == scan scorer == segment scorer,
before AND after merging, including latest-wins updates.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pytest

from lucene_mapreduce_spark.datagen.transcripts import transcripts_df, with_docid
from lucene_mapreduce_spark.index.build import build_segment, latest_wins
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.index.merge import merge_all
from lucene_mapreduce_spark.query.bm25 import bm25_oracle_pandas
from lucene_mapreduce_spark.query.segments import (
    bm25_index_topk,
    exact_stats,
    live_doclens,
)

QUERIES = [
    ("q_head", "tok00000 tok00001"),
    ("q_mixed", "tok00002 tok01998 tok00010"),
    ("q_updated", "freshly_updated_token tok00000"),
    ("q_absent", "zzz_nope"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """3 batches: two disjoint conv ranges + an update batch that rewrites
    some existing turns (upsert semantics)."""
    index_dir = str(tmp_path_factory.mktemp("index"))
    full = with_docid(transcripts_df(spark, n_conv=80, seed=11)).cache()

    b1 = full.filter("conv_id < 'conv_00000050'")
    b2 = full.filter("conv_id >= 'conv_00000050'")
    # update batch: rewrite turn 0 of 10 conversations with new text
    from pyspark.sql import functions as F

    b3 = (
        full.filter("turn_idx = 0 and conv_id < 'conv_00000010'")
        .withColumn("text", F.concat(F.lit("freshly_updated_token "), F.col("text")))
        .withColumn("ts", F.col("ts") + F.expr("interval 30 days"))
    )

    for b in (b1, b2, b3):
        corpus = latest_wins(b.select("doc_id", "text", "ts")).select("doc_id", "text")
        build_segment(spark, corpus, index_dir, num_partitions=8, chunk_docs=1 << 12)

    # effective corpus (latest wins) for the oracle
    eff = (
        latest_wins(
            full.select("doc_id", "text", "ts")
            .unionByName(b3.select("doc_id", "text", "ts"))
        )
        .select("doc_id", "text")
        .toPandas()
    )
    return index_dir, eff


def _assert_identical(spark, index_dir, eff: pd.DataFrame):
    queries = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    got = (
        bm25_index_topk(spark, index_dir, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "rank"])
    )
    for qid, qtext in QUERIES:
        exp = bm25_oracle_pandas(eff, qtext, k=10)
        act = got[got.query_id == qid].reset_index(drop=True)
        assert list(act.doc_id) == list(exp.doc_id), f"{qid} docids"
        assert list(act.score) == list(exp.score), f"{qid} scores (exact float64)"


def test_multisegment_query_rank_identity(spark, built):
    index_dir, eff = built
    m = load_manifest(index_dir)
    assert len(m.segments) == 3
    _assert_identical(spark, index_dir, eff)


def test_upsert_latest_wins(spark, built):
    index_dir, eff = built
    # updated docs must be served with their NEW text only
    queries = spark.createDataFrame(
        [("q", "freshly_updated_token")], "query_id string, query_text string"
    )
    got = bm25_index_topk(spark, index_dir, queries, k=50).toPandas()
    assert len(got) == 10  # exactly the 10 rewritten turns
    assert all(d < (10 << 20) for d in got.doc_id)


def test_merge_all_then_identical(spark, built, tmp_path):
    index_dir, eff = built
    merged_dir = str(tmp_path / "merged")
    shutil.copytree(index_dir, merged_dir)
    merge_all(spark, merged_dir, fanin=2)
    m = load_manifest(merged_dir)
    assert len(m.segments) == 1
    _assert_identical(spark, merged_dir, eff)
    # manifest totals == exact live stats once fully merged
    n_docs, avgdl = exact_stats(spark, merged_dir)
    assert n_docs == len(eff)
    # live doclens unique per doc
    dl = live_doclens(spark, merged_dir).toPandas()
    assert dl.doc_id.is_unique and len(dl) == n_docs


def test_partition_contract(spark, built):
    """Every posting file lives under the phash= dir its terms hash to."""
    from pyspark.sql import functions as F

    index_dir, _ = built
    m = load_manifest(index_dir)
    seg = m.ordered()[0]
    p = os.path.join(index_dir, "segments", seg.segment_id, "postings")
    df = spark.read.parquet(p)
    # phash == num_partitions is the reserved doclen pseudo-term partition
    # (kernels.DL_TERM) — every REAL term must live under its hash dir
    bad = df.filter(
        (F.col("phash") != F.lit(m.num_partitions))
        & (F.pmod(F.xxhash64("term"), F.lit(m.num_partitions)).cast("int") != F.col("phash"))
    ).count()
    assert bad == 0
    assert df.filter(F.col("phash") == F.lit(m.num_partitions)).count() > 0
    assert any(e.startswith("phash=") for e in os.listdir(p))


def test_resume_after_crash_mid_merge(spark, built, tmp_path):
    """Kill between merge levels and after data-write-before-commit; a
    re-run must converge to byte-identical manifests and identical results."""
    index_dir, eff = built

    control = str(tmp_path / "control")
    shutil.copytree(index_dir, control)
    merge_all(spark, control, fanin=2)

    class Boom(Exception):
        pass

    for crash_at in ("written", "committed"):
        victim = str(tmp_path / f"victim_{crash_at}")
        shutil.copytree(index_dir, victim)
        calls = {"n": 0}

        def fault(point, crash_at=crash_at, calls=calls):
            if point == crash_at and calls["n"] == 0:
                calls["n"] = 1
                raise Boom(point)

        with pytest.raises(Boom):
            merge_all(spark, victim, fanin=2, fault=fault)
        merge_all(spark, victim, fanin=2)  # resume

        mc = load_manifest(control)
        mv = load_manifest(victim)
        assert [s.segment_id for s in mv.ordered()] == [s.segment_id for s in mc.ordered()]
        assert mv.ordered()[0].n_postings == mc.ordered()[0].n_postings
        assert mv.ordered()[0].n_docs == mc.ordered()[0].n_docs
        _assert_identical(spark, victim, eff)


def test_manifest_lineage_and_metrics(spark, built):
    index_dir, _ = built
    m = load_manifest(index_dir)
    for s in m.segments:
        assert s.partitions, "per-partition metrics missing"
        assert sum(p["n_postings"] for p in s.partitions) == s.n_postings
        assert "batch_seq" in s.lineage or "merged_from" in s.lineage
    raw = json.load(open(os.path.join(index_dir, "manifest.json")))
    assert raw["committed_seq"] == 3
