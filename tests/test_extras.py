"""Tests: generation-fallback lookup, TTL purge, multimodal kernels,
streaming incremental build."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lucene_mapreduce_spark.datagen.transcripts import (
    gen_transcripts_pandas,
    transcripts_df,
    with_docid,
)
from lucene_mapreduce_spark.index.build import build_segment
from lucene_mapreduce_spark.index.manifest import load_manifest
from lucene_mapreduce_spark.index.ttl import purge_expired
from lucene_mapreduce_spark.operators import multimodal as mm
from lucene_mapreduce_spark.query.fallback import lookup_keys, write_hits_misses
from lucene_mapreduce_spark.query.segments import bm25_index_topk
from lucene_mapreduce_spark.streaming.incremental import run_incremental_build


@pytest.fixture(scope="module")
def gen_index(spark, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("gen_ix"))
    full = with_docid(transcripts_df(spark, n_conv=60, seed=31)).cache()
    b1 = full.filter("conv_id < 'conv_00000030'").select("doc_id", "text")
    b2 = full.filter(
        "conv_id >= 'conv_00000030' and conv_id < 'conv_00000050'"
    ).select("doc_id", "text")
    build_segment(spark, b1, ix, num_partitions=8)
    build_segment(spark, b2, ix, num_partitions=8)
    return ix, full


def test_lookup_generation_fallback(spark, gen_index, tmp_path):
    ix, full = gen_index
    probes = spark.createDataFrame(
        [(0 << 20,), (35 << 20,), (55 << 20,)], "doc_id long"
    )  # gen1 doc, gen2 doc, never-indexed doc
    got = {r["doc_id"]: r for r in lookup_keys(spark, ix, probes).collect()}
    assert got[0 << 20]["hit"] and got[0 << 20]["gen_seq"] == 1
    assert got[35 << 20]["hit"] and got[35 << 20]["gen_seq"] == 2
    assert not got[55 << 20]["hit"]

    hits_path, miss_path = write_hits_misses(lookup_keys(spark, ix, probes), str(tmp_path))
    assert spark.read.parquet(hits_path).count() == 2
    assert spark.read.parquet(miss_path).count() == 1


def test_lookup_max_generations_window(spark, gen_index):
    ix, _ = gen_index
    probes = spark.createDataFrame([(0,)], "doc_id long")
    got = lookup_keys(spark, ix, probes, max_generations=1).collect()[0]
    assert not got["hit"]  # doc 0 lives in gen 1, outside the 1-gen window


def test_ttl_purge(spark, gen_index, tmp_path):
    ix, full = gen_index
    import shutil

    victim = str(tmp_path / "purged")
    shutil.copytree(ix, victim)
    expired = spark.createDataFrame(
        [(int(r["doc_id"]),) for r in full.filter("conv_id < 'conv_00000005'")
         .select("doc_id").collect()],
        "doc_id long",
    )
    n_expired = expired.count()
    before = load_manifest(victim)
    n_before = sum(s.n_docs for s in before.segments)
    purge_expired(spark, victim, expired)
    after = load_manifest(victim)
    assert len(after.segments) == 1
    assert after.segments[0].n_docs == n_before - n_expired
    # purged docs unfindable via every query path
    q = spark.createDataFrame([("q", "tok00000")], "query_id string, query_text string")
    got = bm25_index_topk(spark, victim, q, k=1000).toPandas()
    assert all(d >= (5 << 20) for d in got.doc_id)
    resolved = lookup_keys(spark, victim, expired)
    assert resolved.filter("hit").count() == 0


def test_lookup_join_enrichment(spark, tmp_path):
    """J1 with stored fields: probes get the NEWEST payload; upserts serve
    the updated text; misses have null text; docstore survives merges."""
    from lucene_mapreduce_spark.index.merge import merge_all
    from lucene_mapreduce_spark.query.fallback import lookup_join

    ix = str(tmp_path / "store_ix")
    full = with_docid(transcripts_df(spark, n_conv=20, seed=13)).cache()
    b1 = full.select("doc_id", "text")
    build_segment(spark, b1, ix, num_partitions=4, store_fields=True)
    upd = (
        full.filter("turn_idx = 0 and conv_id < 'conv_00000003'")
        .withColumn("text", F.concat(F.lit("UPDATED "), F.col("text")))
        .select("doc_id", "text")
    )
    build_segment(spark, upd, ix, num_partitions=4, store_fields=True)

    probes = spark.createDataFrame([(0,), (1 << 20,), (99 << 20,)], "doc_id long")
    got = {r["doc_id"]: r for r in lookup_join(spark, ix, probes).collect()}
    assert got[0]["hit"] and got[0]["text"].startswith("UPDATED ")
    assert got[1 << 20]["hit"] and got[1 << 20]["gen_seq"] == 2
    assert not got[99 << 20]["hit"] and got[99 << 20]["text"] is None

    merge_all(spark, ix)
    got2 = {r["doc_id"]: r for r in lookup_join(spark, ix, probes).collect()}
    assert got2[0]["text"] == got[0]["text"]
    assert not got2[99 << 20]["hit"]


def test_multimodal_kernels(spark):
    media = mm.synth_media(spark, n=30, seed=5).cache()
    feats = mm.decode_features(media).toPandas()
    assert len(feats) == 30
    assert set(feats.kind) == {"image", "audio", "video"}
    assert (feats.n_bytes > 0).all() and feats.mean_val.between(0, 255).all()
    # determinism
    feats2 = mm.decode_features(media).toPandas()
    assert feats.sort_values("media_id").reset_index(drop=True).equals(
        feats2.sort_values("media_id").reset_index(drop=True)
    )

    resized = mm.resize_images(media).toPandas()
    assert len(resized) == media.filter("kind = 'image'").count()
    for blob in resized.data:
        assert bytes(blob[:4]) == mm.MAGIC and len(blob) == 16 + 16  # 4x4 raster

    frames = mm.sample_frames(media, every=2).toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "rate").toPandas()
    expected = sum((r + 1) // 2 for r in vids.rate)
    assert len(frames) == expected


def test_streaming_incremental_build(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ix = str(tmp_path / "stream_ix")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    pdf = gen_transcripts_pandas(n_conv=40, seed=77)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # parquet ns -> us for Spark
    half = pdf["conv_id"] < "conv_00000020"
    pdf[half].to_parquet(src + "/part1.parquet", index=False)

    n1 = run_incremental_build(spark, src, ix, ckpt, num_partitions=8)
    assert n1 >= 1
    m1 = load_manifest(ix)
    assert len(m1.segments) == n1
    assert all("stream_batch_id" in s.lineage for s in m1.segments)

    # append new data; SAME checkpoint => only the new file is processed
    pdf[~half].to_parquet(src + "/part2.parquet", index=False)
    n2 = run_incremental_build(spark, src, ix, ckpt, num_partitions=8)
    assert n2 >= 1
    m2 = load_manifest(ix)
    assert len(m2.segments) == n1 + n2
    total_docs = sum(s.n_docs for s in m2.segments)
    assert total_docs == len(pdf)

    # re-run with nothing new: no batches, no segments
    n3 = run_incremental_build(spark, src, ix, ckpt, num_partitions=8)
    m3 = load_manifest(ix)
    assert len(m3.segments) == len(m2.segments)


def test_stateful_conversation_progress(spark, tmp_path):
    """applyInPandasWithState: state must accumulate ACROSS micro-batches —
    a conversation split over two files reports cumulative turn counts."""
    from lucene_mapreduce_spark.datagen.transcripts import TRANSCRIPT_SCHEMA
    from lucene_mapreduce_spark.streaming.incremental import conversation_progress

    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = gen_transcripts_pandas(n_conv=6, seed=55)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    # split each conversation's turns across two files by parity
    pdf[pdf.turn_idx % 2 == 0].to_parquet(src + "/a.parquet", index=False)
    pdf[pdf.turn_idx % 2 == 1].to_parquet(src + "/b.parquet", index=False)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .parquet(src)
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql(
        "SELECT conv_id, max(turns_seen) AS turns FROM conv_progress GROUP BY conv_id"
    ).toPandas()
    expected = pdf.groupby("conv_id").size()
    assert len(out) == 6
    for _, row in out.iterrows():
        assert row["turns"] == expected[row["conv_id"]], row["conv_id"]


def test_stream_dedup_state_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch must be dropped by the
    carried seen-set state; fresh content must still be kept."""
    import pandas as pd

    from lucene_mapreduce_spark.streaming.incremental import stream_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch A: docs 0-3 (doc 3 duplicates doc 1's content)
    pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text_md5": ["h0", "h1", "h2", "h1"]}
    ).to_parquet(src + "/a.parquet", index=False)
    # batch B: doc 4 duplicates batch A's h0; doc 5 is fresh
    pd.DataFrame(
        {"doc_id": [4, 5], "text_md5": ["h0", "h3"]}
    ).to_parquet(src + "/b.parquet", index=False)

    stream = (
        spark.readStream.schema("doc_id long, text_md5 string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName("stream_dedup_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        r["text_md5"]: r["doc_id"]
        for r in spark.table("stream_dedup_t").collect()
    }
    # file listing order isn't guaranteed; whichever batch ran first, each
    # hash is emitted exactly once with that batch's min doc_id
    assert set(out) == {"h0", "h1", "h2", "h3"}
    assert out["h1"] == 1 and out["h2"] == 2 and out["h3"] == 5
    assert out["h0"] in (0, 4)
    assert spark.table("stream_dedup_t").count() == 4


def test_windowed_turn_counts_batch_semantics(spark):
    # the windowed agg is testable in batch mode (same plan semantics)
    from lucene_mapreduce_spark.streaming.incremental import windowed_turn_counts

    df = transcripts_df(spark, n_conv=30, seed=3)
    out = windowed_turn_counts(df).toPandas()
    assert out.n_turns.sum() == df.count()
    assert set(out.columns) == {"day", "role", "n_turns"}
