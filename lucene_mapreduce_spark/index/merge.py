"""Hierarchical, checkpoint-resumable segment merge.

The reference's merge story is Lucene ``forceMerge(1)`` every 2nd hour / at
day end inside each reducer (IndexBuilderReducer.java:137,171-177;
IndexBuilder.java:164-176) — single-node, in-place. Here a merge is a Spark
job over immutable inputs: decode -> mask shadowed docs (latest-wins upsert)
-> concat -> re-encode per (term, chunk), then a manifest commit. Crash at
any point: data files are deterministically named and overwrite-rerunnable,
and the manifest only flips after the new segment is fully written — so a
re-run resumes mid-merge exactly where the last commit left it (north rule:
"index builds resume mid-merge after failure").

Scale shape: a merge shuffles only the posting *rows* (term-chunk blocks),
never re-tokenizes the corpus; masking joins ride the same (chunk) keys.
Memory per task stays bounded by chunk_docs regardless of term skew.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.build import read_doclens, segment_stats
from lucene_mapreduce_spark.index.kernels import POSTING_SCHEMA, _merge_stream
from lucene_mapreduce_spark.index.partitioning import (
    even_salted_repartition,
    salted_plan,
)
from lucene_mapreduce_spark.index.manifest import (
    SegmentMeta,
    commit_manifest,
    load_manifest,
    segment_dir,
)


def _load_doclens(
    spark: SparkSession, index_dir: str, metas: list[SegmentMeta], num_partitions: int
) -> DataFrame:
    dfs = []
    for meta in metas:
        d = read_doclens(
            spark, segment_dir(index_dir, meta.segment_id), num_partitions
        )
        dfs.append(d.withColumn("seg_seq", F.lit(meta.min_seq)))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _propagate_positions(
    spark: SparkSession,
    index_dir: str,
    metas: list[SegmentMeta],
    seg_path: str,
    live: DataFrame,
    m,
) -> None:
    """Carry the positions sidecar through a segment rewrite: union the
    inputs' rows, keep only each doc's live (newest) copy, rewrite with the
    standard (phash, salt) placement and (term, chunk, doc_id) sort so the
    serving-side pruning contract is identical to a fresh build's."""
    pos = None
    for meta in metas:
        p = spark.read.parquet(
            os.path.join(segment_dir(index_dir, meta.segment_id), "positions")
        ).withColumn("seg_seq", F.lit(meta.min_seq))
        pos = p if pos is None else pos.unionByName(p)
    parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), m.num_partitions
    )
    n_tasks, n_salt = salted_plan(parts, m.num_partitions)
    live_pos = (
        pos.join(live.select("doc_id", "seg_seq"), ["doc_id", "seg_seq"], "left_semi")
        .withColumn("salt", F.pmod(F.col("chunk"), F.lit(n_salt)))
    )
    (
        even_salted_repartition(live_pos, n_tasks, n_salt)
        .sortWithinPartitions("phash", "term", "chunk", "doc_id")
        .select("phash", "term", "chunk", "doc_id", "positions")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("phash")
        .parquet(os.path.join(seg_path, "positions"))
    )


def _propagate_fields(
    spark: SparkSession,
    index_dir: str,
    metas: list[SegmentMeta],
    seg_path: str,
    live: DataFrame,
    m,
    field_names: list[str],
) -> None:
    """Carry the indexed-fields sidecar through a rewrite: union inputs,
    keep each doc's live copy, restore the (field, value, doc_id) layout."""
    rows = None
    for meta in metas:
        r = spark.read.parquet(
            os.path.join(segment_dir(index_dir, meta.segment_id), "fields")
        ).withColumn("seg_seq", F.lit(meta.min_seq))
        rows = r if rows is None else rows.unionByName(r)
    (
        rows.filter(F.col("field").isin(field_names))
        .join(live.select("doc_id", "seg_seq"), ["doc_id", "seg_seq"], "left_semi")
        .repartition(m.num_partitions, "field", "value")
        .sortWithinPartitions(
            "field", F.col("num_value").asc_nulls_last(), "value", "doc_id"
        )
        .select("field", "value", "num_value", "doc_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("field")
        .parquet(os.path.join(seg_path, "fields"))
    )


def _dead_markers(
    spark: SparkSession, dead_by_chunk: DataFrame, num_partitions: int
) -> DataFrame:
    """Dead-list marker rows for the merge/TTL shuffle: one row per
    (phash, seg_seq, chunk) — phash 0..P inclusive so the DL_TERM pseudo
    partition is masked too — with term == "" so they sort ahead of every
    real term (and DL_TERM's leading NUL) inside their phash section.
    The kernel (_merge_stream) consumes them into a partition-local map."""
    phashes = spark.range(num_partitions + 1).select(
        F.col("id").cast("int").alias("phash")
    )
    return dead_by_chunk.crossJoin(F.broadcast(phashes)).select(
        "phash",
        F.lit("").alias("term"),
        "chunk",
        F.lit(None).cast("int").alias("df_chunk"),
        F.lit(None).cast("long").alias("cf_chunk"),
        F.lit(None).cast("int").alias("max_tf"),
        F.lit(None).cast("int").alias("min_dl"),
        F.lit(None).cast("binary").alias("payload"),
        "seg_seq",
        F.col("dead"),
    )


def merge_once(
    spark: SparkSession,
    index_dir: str,
    segment_ids: list[str],
    fault: Callable[[str], None] | None = None,
) -> SegmentMeta:
    """Merge a seq-contiguous group of segments into one; commit manifest.

    ``fault`` is a test hook called with checkpoint names ("written",
    "committed") to inject crashes for the resume tests.
    """
    m = load_manifest(index_dir)
    assert m is not None, "no manifest"
    metas = sorted((m.segment(s) for s in segment_ids), key=lambda s: s.min_seq)
    # contiguity check: recency intervals must form one unbroken range
    all_sorted = m.ordered()
    idxs = [all_sorted.index(x) for x in metas]
    assert idxs == list(range(min(idxs), max(idxs) + 1)), (
        "merge group must be seq-contiguous to preserve upsert recency order"
    )

    min_seq = metas[0].min_seq
    max_seq = metas[-1].max_seq
    level = max(s.level for s in metas) + 1
    seg_id = f"L{level}_{min_seq:06d}_{max_seq:06d}"
    seg_path = segment_dir(index_dir, seg_id)

    # ---- shadow (dead) docs: docid present in any newer input segment
    doclens = _load_doclens(spark, index_dir, metas, m.num_partitions)
    w = Window.partitionBy("doc_id").orderBy(F.col("seg_seq").desc())
    ranked = doclens.withColumn("rn", F.row_number().over(w))
    live = ranked.filter(F.col("rn") == 1).select("doc_id", "dl", "seg_seq")
    dead = ranked.filter(F.col("rn") > 1).select("doc_id", "seg_seq")

    chunk_docs = m.chunk_docs
    # exact int64 division (DIV), matching the build kernel's `//`: float
    # division diverges near chunk boundaries for doc_id >= 2^53 and would
    # silently miss dead docs at the conv<<20 packing scale (~2^57)
    dead_by_chunk = (
        dead.withColumn("chunk", F.expr(f"doc_id DIV {chunk_docs}"))
        .groupBy("seg_seq", "chunk")
        .agg(F.collect_list("doc_id").alias("dead"))
    )

    rows = None
    for meta in metas:
        r = spark.read.parquet(
            os.path.join(segment_dir(index_dir, meta.segment_id), "postings")
        ).withColumn("seg_seq", F.lit(meta.min_seq))
        rows = r if rows is None else rows.unionByName(r)

    merge_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), m.num_partitions
    )
    # One write covers postings AND doclens: the DL_TERM pseudo rows merge
    # through the same kernel, and the dead-list masking drops shadowed
    # docs from them exactly as it does from real posting lists.
    n_tasks, n_salt = salted_plan(merge_parts, m.num_partitions)
    # Dead lists ride the shuffle as MARKER rows (term == "", one per
    # (phash, seg_seq, chunk)) that sort ahead of their phash section —
    # each list ships O(num_partitions) times total. Joining them onto the
    # posting rows instead (the old plan) replicated a chunk's whole dead
    # array onto EVERY (term, chunk) block of that chunk: at 8M turns that
    # was ~50 GB of shuffled dead lists against ~0.3 GB of payloads, a
    # 12.8x merge blow-up at 4x data (BENCH.md round 3).
    merged = (
        rows.select(
            "phash", "term", "chunk", "df_chunk", "cf_chunk", "max_tf",
            "min_dl", "payload", "seg_seq",
            F.lit(None).cast("array<long>").alias("dead"),
        )
        .unionByName(_dead_markers(spark, dead_by_chunk, m.num_partitions))
        .withColumn("salt", F.pmod(F.col("chunk"), F.lit(n_salt)))
    )
    merged = (
        even_salted_repartition(merged, n_tasks, n_salt)
        .sortWithinPartitions("phash", "term", "chunk", "seg_seq")
        .drop("salt")
        # stat columns ride along so single-source groups with no dead docs
        # pass through the kernel without decode/re-encode
        .mapInPandas(_merge_stream, schema=POSTING_SCHEMA)
    )
    (
        merged.write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("phash")
        .parquet(os.path.join(seg_path, "postings"))
    )

    # stored fields propagate through merges: newest copy per live doc
    has_docstore = all(s.has_docstore for s in metas)
    if has_docstore:
        stores = None
        for meta in metas:
            d = spark.read.parquet(
                os.path.join(segment_dir(index_dir, meta.segment_id), "docstore")
            ).withColumn("seg_seq", F.lit(meta.min_seq))
            stores = d if stores is None else stores.unionByName(d)
        (
            stores.join(live.select("doc_id", "seg_seq"), ["doc_id", "seg_seq"], "left_semi")
            .drop("seg_seq")
            .repartitionByRange(m.num_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(seg_path, "docstore"))
        )
    # the term-dictionary sidecar regenerates from the merged blocks'
    # columnar stats (df_chunk stays exact through pass-through and
    # dead-doc rewrites) — live counts, no payload decode
    has_dict = all(s.has_dict for s in metas)
    if has_dict:
        from lucene_mapreduce_spark.index.build import write_dictionary

        write_dictionary(spark, seg_path, m.num_partitions)

    # positional postings propagate like the docstore: the (term, doc)
    # rows of each doc's newest (live) copy, re-laid-out under the new
    # segment's phash dirs — no recompute from text
    has_positions = all(s.has_positions for s in metas)
    if has_positions:
        _propagate_positions(spark, index_dir, metas, seg_path, live, m)

    # indexed keyword fields: intersection of the inputs' field sets
    # propagates, live rows only (same latest-wins join as the docstore)
    indexed_fields = sorted(
        set.intersection(*(set(s.indexed_fields) for s in metas))
    ) if metas else []
    if indexed_fields:
        _propagate_fields(spark, index_dir, metas, seg_path, live, m, indexed_fields)

    if fault:
        fault("written")  # crash here => manifest still lists the inputs

    part_stats, totals = segment_stats(spark, seg_path, m.num_partitions)
    n_terms = int(sum(r["n_terms"] for r in part_stats))

    meta_out = SegmentMeta(
        segment_id=seg_id,
        level=level,
        min_seq=min_seq,
        max_seq=max_seq,
        n_docs=int(totals["n_docs"]),
        total_tokens=int(totals["total_tokens"] or 0),
        n_terms=int(n_terms),
        n_postings=int(sum(r["n_postings"] for r in part_stats)),
        parents=[s.segment_id for s in metas],
        partitions=[
            {
                "phash": int(r["phash"]),
                "n_terms": int(r["n_terms"]),
                "n_postings": int(r["n_postings"]),
            }
            for r in sorted(part_stats, key=lambda r: r["phash"])
        ],
        lineage={"merged_from": [s.segment_id for s in metas]},
        has_docstore=has_docstore,
        has_dict=has_dict,
        has_positions=has_positions,
        indexed_fields=indexed_fields,
    )
    m.segments = [s for s in m.segments if s.segment_id not in set(segment_ids)]
    m.segments.append(meta_out)
    commit_manifest(index_dir, m, expect_version=m.version)
    if fault:
        fault("committed")
    return meta_out


def merge_all(
    spark: SparkSession,
    index_dir: str,
    fanin: int = 8,
    fault: Callable[[str], None] | None = None,
) -> str:
    """Hierarchically merge until one segment remains; each step is a
    manifest checkpoint, so re-running after a crash continues the plan
    (deterministic segment ids => already-written outputs are reused by
    overwrite, never duplicated)."""
    while True:
        m = load_manifest(index_dir)
        assert m is not None
        segs = m.ordered()
        if len(segs) <= 1:
            return segs[0].segment_id if segs else ""
        group = [s.segment_id for s in segs[: max(2, min(fanin, len(segs)))]]
        merge_once(spark, index_dir, group, fault=fault)
