"""TTL expiry: purge expired docs from the index (J3 on real segments).

The reference runs a dedicated MapReduce anti-join job over TSV dumps
(TTLFilterReducer.java:26-72: drop any key marked 'expired'). Here expiry is
a segment rewrite: the expired doc_ids become extra `dead` entries fed to
the same streaming merge kernel the hierarchical merge uses, so one pass
rewrites postings AND doclens and commits a fresh manifest atomically.
Queries before the commit see the old index; after it, the purged docs are
gone from every path (batch scorer, WAND, lookups).
"""

from __future__ import annotations

import os

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


def delete_docs(
    spark: SparkSession, index_dir: str, docids: "DataFrame | list[int]"
) -> SegmentMeta:
    """Explicit deletion (Lucene deleteDocuments parity — the lifecycle op
    the reference only has in TTL form): physically rewrite the index
    without the given doc_ids. Same one-pass segment rewrite as TTL
    expiry; after the atomic manifest flip the docs are gone from every
    query path (batch scorer, WAND, lookups, stored fields)."""
    if not isinstance(docids, DataFrame):
        docids = spark.createDataFrame(
            [(int(d),) for d in docids], "doc_id long"
        )
    return purge_expired(spark, index_dir, docids)


def purge_expired(
    spark: SparkSession, index_dir: str, expired: DataFrame, key_col: str = "doc_id"
) -> SegmentMeta:
    """Rewrite the whole index without the expired doc_ids (also performs a
    full merge — expiry rides the merge it would have triggered anyway).
    Returns the new single segment's meta."""
    m = load_manifest(index_dir)
    assert m is not None, f"no index at {index_dir}"
    metas = m.ordered()
    expired_ids = expired.select(
        F.col(key_col).cast("long").alias("doc_id")
    ).distinct()

    # live = newest copy per doc, minus expired
    doclens = None
    for s in metas:
        d = read_doclens(
            spark, segment_dir(index_dir, s.segment_id), m.num_partitions
        ).withColumn("seg_seq", F.lit(s.min_seq))
        doclens = d if doclens is None else doclens.unionByName(d)
    w = Window.partitionBy("doc_id").orderBy(F.col("seg_seq").desc())
    ranked = doclens.withColumn("rn", F.row_number().over(w))
    live_pairs = (
        ranked.filter(F.col("rn") == 1)
        .join(expired_ids, "doc_id", "left_anti")
        .select("doc_id", "seg_seq")
    )
    # dead per (segment, chunk): shadowed copies + every expired doc
    shadowed = ranked.filter(F.col("rn") > 1).select("doc_id", "seg_seq")
    exp_all = None
    for s in metas:
        e = expired_ids.withColumn("seg_seq", F.lit(s.min_seq))
        exp_all = e if exp_all is None else exp_all.unionByName(e)
    dead = shadowed.unionByName(exp_all).distinct()
    # exact int64 division (DIV) — float division misses chunk boundaries
    # for doc_id >= 2^53 (see merge.py)
    dead_by_chunk = (
        dead.withColumn("chunk", F.expr(f"doc_id DIV {m.chunk_docs}"))
        .groupBy("seg_seq", "chunk")
        .agg(F.collect_list("doc_id").alias("dead"))
    )

    rows = None
    for s in metas:
        r = spark.read.parquet(
            os.path.join(segment_dir(index_dir, s.segment_id), "postings")
        ).withColumn("seg_seq", F.lit(s.min_seq))
        rows = r if rows is None else rows.unionByName(r)

    min_seq, max_seq = metas[0].min_seq, metas[-1].max_seq
    level = max(s.level for s in metas) + 1
    seg_id = f"L{level}_{min_seq:06d}_{max_seq:06d}_ttl"
    seg_path = segment_dir(index_dir, seg_id)

    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), m.num_partitions)
    # One write covers postings AND doclens (DL_TERM pseudo rows): expired
    # and shadowed docs are masked from both by the same dead lists.
    n_tasks, n_salt = salted_plan(parts, m.num_partitions)
    # dead lists ship as marker rows, never per-posting-row joins — see
    # merge._dead_markers (a TTL purge's dead set is a large fraction of
    # the index, the worst case for the replicating join this replaces)
    from lucene_mapreduce_spark.index.merge import _dead_markers

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
        .mapInPandas(_merge_stream, schema=POSTING_SCHEMA)
    )
    (
        merged.write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("phash")
        .parquet(os.path.join(seg_path, "postings"))
    )

    # stored fields survive the purge: newest copy per live doc (mirrors
    # merge.py — the reference keeps its stored `mapinfo` through TTL jobs,
    # TTLFilterReducer.java:26-72 only drops expired keys)
    has_docstore = all(s.has_docstore for s in metas)
    if has_docstore:
        stores = None
        for s in metas:
            d = spark.read.parquet(
                os.path.join(segment_dir(index_dir, s.segment_id), "docstore")
            ).withColumn("seg_seq", F.lit(s.min_seq))
            stores = d if stores is None else stores.unionByName(d)
        (
            stores.join(live_pairs, ["doc_id", "seg_seq"], "left_semi")
            .drop("seg_seq")
            .repartitionByRange(m.num_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(seg_path, "docstore"))
        )

    has_dict = all(s.has_dict for s in metas)
    if has_dict:
        from lucene_mapreduce_spark.index.build import write_dictionary

        write_dictionary(spark, seg_path, m.num_partitions)

    # positions survive the purge like the docstore: live copies only
    has_positions = all(s.has_positions for s in metas)
    if has_positions:
        from lucene_mapreduce_spark.index.merge import _propagate_positions

        _propagate_positions(spark, index_dir, metas, seg_path, live_pairs, m)

    indexed_fields = sorted(
        set.intersection(*(set(s.indexed_fields) for s in metas))
    ) if metas else []
    if indexed_fields:
        from lucene_mapreduce_spark.index.merge import _propagate_fields

        _propagate_fields(
            spark, index_dir, metas, seg_path, live_pairs, m, indexed_fields
        )

    part_stats, totals = segment_stats(spark, seg_path, m.num_partitions)
    meta_out = SegmentMeta(
        segment_id=seg_id,
        level=level,
        min_seq=min_seq,
        max_seq=max_seq,
        n_docs=int(totals["n_docs"]),
        total_tokens=int(totals["total_tokens"] or 0),
        n_terms=int(sum(r["n_terms"] for r in part_stats)),
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
        lineage={"ttl_purge_of": [s.segment_id for s in metas]},
        has_docstore=has_docstore,
        has_dict=has_dict,
        has_positions=has_positions,
        indexed_fields=indexed_fields,
    )
    m.segments = [meta_out]
    commit_manifest(index_dir, m, expect_version=m.version)
    return meta_out
