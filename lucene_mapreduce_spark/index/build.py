"""Segment build: corpus batch -> immutable posting-list segment + manifest.

Replaces the reference's read-modify-write incremental Lucene build
(IndexBuilderReducer.java:104-232: copy previous index local, append an hour,
copy back) with immutable per-batch segments plus a manifest pointer flip —
no in-place mutation, so failed builds never corrupt a published index.

Shuffle/skew design for 10^12 turns (see kernels.py for the stage kernels):
- map side tokenizes, counts per-doc tf AND locally encodes partial posting
  lists per (term, chunk) — the shuffle carries compressed payloads
  (~2-4 B/posting), never tokens or posting rows;
- the shuffle key is (phash, chunk) where chunk = doc_id // chunk_docs: a
  head term (Zipf skew — the reason the reference used prime partition
  counts, IndexBuilderDriver.java:46) spreads its chunks across tasks, and
  reduce-side memory stays bounded by chunk_docs regardless of term skew;
- chunk_docs is a *docid-range* width, auto-sized from the corpus docid span
  when a new index is created and pinned in the manifest afterwards;
- segment files are written partitionBy(phash) where
  phash = pmod(xxhash64(term), P): the persisted partitioning contract the
  query side prunes on (reference contract: reducer count == index partition
  count, XdiReportDriver.java:76).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.index.kernels import (
    DOCLEN_SCHEMA,
    PARTIAL_SCHEMA,
    POSTING_SCHEMA,
    _decode_doclens,
    _make_partial_encoder,
    _merge_stream,
)
from lucene_mapreduce_spark.index.manifest import (
    Manifest,
    SegmentMeta,
    commit_manifest,
    load_manifest,
    segment_dir,
)
from lucene_mapreduce_spark.index.partitioning import (
    even_salted_repartition,
    salted_plan,
)


def latest_wins(corpus: DataFrame, doc_col: str = "doc_id", ts_col: str = "ts") -> DataFrame:
    """A1 — dedup a batch to one row per doc, newest ts wins, deterministic
    tie-break on the full row hash (reference intent: IndexBuilderReducer.java:142-163)."""
    cols = [c for c in corpus.columns]
    tie = F.struct(F.col(ts_col), F.xxhash64(*cols))
    return (
        corpus.groupBy(doc_col)
        .agg(F.max_by(F.struct(*[c for c in cols if c != doc_col]), tie).alias("r"))
        .select(doc_col, "r.*")
    )


def segment_stats(spark: SparkSession, seg_path: str, num_partitions: int):
    """Per-partition metrics (A2's per-key counts, generalized) + doc totals
    for a just-written segment. n_terms sums over partitions because term
    fully determines phash.

    Doc totals come for free from the reserved doclen pseudo-term rows
    (phash == num_partitions): entries carry tf=dl, so n_docs = sum(df_chunk)
    and total_tokens = sum(cf_chunk) — plain columnar sums, no decode.

    Small segments (metadata well under a GB) aggregate driver-side with
    multithreaded DuckDB over the parquet footers/columns — zero extra Spark
    jobs, which is what keeps small-batch builds free of fixed job overhead.
    Larger segments fall back to ONE Spark job (same results).
    """
    post_dir = os.path.join(seg_path, "postings")
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(seg_path)
        for f in fs
    )
    if size < 1 << 30:
        import duckdb

        con = duckdb.connect()
        rows = con.sql(
            f"""SELECT phash, count(DISTINCT term) AS n_terms,
                       sum(df_chunk)::BIGINT AS n_postings,
                       sum(cf_chunk)::BIGINT AS n_tokens
                FROM read_parquet('{post_dir}/*/*.parquet', hive_partitioning=1)
                GROUP BY 1"""
        ).fetchall()
        con.close()
        rows = [(int(p), int(t), int(n), int(c)) for p, t, n, c in rows]
    else:
        rows = [
            (int(r["phash"]), int(r["n_terms"]), int(r["n_postings"]),
             int(r["n_tokens"] or 0))
            for r in (
                spark.read.parquet(post_dir)
                .groupBy("phash")
                .agg(
                    F.countDistinct("term").alias("n_terms"),
                    F.sum("df_chunk").alias("n_postings"),
                    F.sum("cf_chunk").alias("n_tokens"),
                )
                .collect()
            )
        ]
    part_stats = [
        {"phash": p, "n_terms": t, "n_postings": n}
        for p, t, n, _ in rows
        if p != num_partitions
    ]
    dl_rows = [(n, c) for p, _, n, c in rows if p == num_partitions]
    n_docs = dl_rows[0][0] if dl_rows else 0
    total_tokens = dl_rows[0][1] if dl_rows else 0
    return part_stats, {"n_docs": int(n_docs), "total_tokens": int(total_tokens)}


def read_doclens(
    spark: SparkSession,
    seg_path: str,
    num_partitions: int,
    chunk_range: tuple[int, int] | None = None,
) -> DataFrame:
    """(doc_id, dl) of one segment, decoded from the reserved doclen
    pseudo-term rows — reads exactly one phash directory (path pruning).
    chunk_range=(lo, hi) additionally prunes to the inclusive chunk span
    via parquet row-group stats (rows are chunk-sorted) before decoding."""
    p = os.path.join(seg_path, "postings", f"phash={num_partitions}")
    if not os.path.exists(p):
        return spark.createDataFrame([], DOCLEN_SCHEMA)
    rows = spark.read.parquet(p)
    if chunk_range is not None:
        rows = rows.filter(F.col("chunk").between(*chunk_range))
    return rows.select("payload").mapInPandas(_decode_doclens, schema=DOCLEN_SCHEMA)


def write_dictionary(
    spark: SparkSession, seg_path: str, num_partitions: int, n_files: int = 1
) -> None:
    """Term-dictionary sidecar (Lucene's terms index analogue): one
    term-sorted parquet of (term, df, cf) per segment, produced by COLUMNAR
    sums of the posting blocks' df_chunk/cf_chunk — no payload decode, a
    column-pruned aggregation over just-written output. The merge kernel
    keeps df_chunk exact through pass-through and dead-doc rewrites, so a
    regenerated dictionary always holds live counts. Term-sorted files
    answer prefix expansion as a row-group range seek and carry df for
    scoring without touching postings."""
    dic = (
        spark.read.parquet(os.path.join(seg_path, "postings"))
        .filter(F.col("phash") < F.lit(num_partitions))
        .groupBy("term")
        .agg(
            F.sum("df_chunk").cast("long").alias("df"),
            F.sum("cf_chunk").cast("long").alias("cf"),
        )
    )
    (
        dic.repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(seg_path, "dictionary"))
    )


def write_positions(
    spark: SparkSession,
    seg_path: str,
    corpus: DataFrame,
    num_partitions: int,
    chunk_docs: int,
) -> None:
    """Positional-postings sidecar (Lucene's .pos file analogue): one row
    per (term, doc) holding the ascending token positions of the term in
    the doc, laid out exactly like the postings — partitionBy(phash),
    rows sorted (term, chunk, doc_id) so term filters prune row groups and
    chunk spans prune ranges. Phrase/proximity queries verify against this
    instead of re-tokenizing stored fields.

    The (term, positions) pairs are computed map-side with higher-order
    array expressions (pure codegen, no token-granular shuffle); the only
    shuffle is the (phash, salt) placement before the partitioned write —
    rows are (term, doc)-granular with an int-array payload, the same
    order of magnitude as Lucene's .pos data itself."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_col

    toks = F.coalesce(tokenize_col(F.col("text")), F.array())
    pairs = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.filter(
                F.transform(
                    toks, lambda x, i: F.when(x == t, i).otherwise(F.lit(-1))
                ),
                lambda p: p >= 0,
            ).alias("positions"),
        ),
    )
    enc_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), num_partitions
    )
    n_tasks, n_salt = salted_plan(enc_parts, num_partitions)
    pos = (
        corpus.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(pairs).alias("p"),
        )
        .select(
            F.pmod(F.xxhash64(F.col("p.term")), F.lit(num_partitions))
            .cast("int")
            .alias("phash"),
            F.col("p.term").alias("term"),
            F.expr(f"doc_id DIV {chunk_docs}").alias("chunk"),
            "doc_id",
            F.col("p.positions").alias("positions"),
        )
        .withColumn("salt", F.pmod(F.col("chunk"), F.lit(n_salt)))
    )
    pos = (
        even_salted_repartition(pos, n_tasks, n_salt)
        .sortWithinPartitions("phash", "term", "chunk", "doc_id")
        .select("phash", "term", "chunk", "doc_id", "positions")
    )
    (
        pos.write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("phash")
        .parquet(os.path.join(seg_path, "positions"))
    )


def write_fields(
    spark: SparkSession,
    seg_path: str,
    corpus: DataFrame,
    field_cols: list[str],
    num_partitions: int,
) -> None:
    """Indexed-keyword-fields sidecar (Lucene StringField analogue): one
    (field, value, doc_id) row per doc per indexed column, laid out
    partitionBy(field) with rows sorted (value, doc_id) — a field clause
    reads one field directory with the value filter pruning row groups,
    exactly a keyword posting list. Values index untokenized (exact
    match), like Lucene's StringField vs TextField."""
    sel = None
    for c in field_cols:
        r = corpus.select(
            F.lit(c).alias("field"),
            F.col(c).cast("string").alias("value"),
            # numeric twin (NULL for non-numeric — try_cast, ANSI-safe):
            # range clauses (Lucene PointRangeQuery) filter this with
            # row-group stats instead of string compares
            F.col(c).try_cast("double").alias("num_value"),
            F.col("doc_id").cast("long").alias("doc_id"),
        ).filter(F.col("value").isNotNull())
        sel = r if sel is None else sel.unionByName(r)
    (
        sel.repartition(num_partitions, "field", "value")
        # numeric fields cluster by num_value (range pruning), string
        # fields (num_value all NULL) by value — equal values stay
        # contiguous either way, so exact-match pruning holds for both
        .sortWithinPartitions(
            "field", F.col("num_value").asc_nulls_last(), "value", "doc_id"
        )
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("field")
        .parquet(os.path.join(seg_path, "fields"))
    )


def build_segment(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    num_partitions: int = 32,
    chunk_docs: int | None = None,
    lineage: dict[str, Any] | None = None,
    store_fields: bool = False,
    with_dict: bool = False,
    with_positions: bool = False,
    index_fields: list[str] | None = None,
) -> SegmentMeta:
    """Build one immutable level-0 segment from a (doc_id, text) batch and
    commit it to the manifest. Returns the committed SegmentMeta.

    corpus must be unique per doc_id (apply ``latest_wins`` upstream for
    update batches). ``store_fields`` additionally writes a doc_id-range-
    sorted docstore parquet (the reference's compressed stored field,
    IndexBuilderReducer.java:157-158) enabling payload-enriching lookup
    joins (query/fallback.lookup_join) — parquet's column compression plays
    the role of CompressionTools.compress.
    """
    m = load_manifest(index_dir)
    base_version = m.version if m is not None else 0
    if m is not None:
        # the index's physical contract is already pinned
        num_partitions, chunk_docs = m.num_partitions, m.chunk_docs
    else:
        if chunk_docs is None:
            # auto-size the docid-range chunk width: ~4 chunks per shuffle
            # partition across the observed docid span, so a head term that
            # appears in every doc still splits into ~4P parallel,
            # memory-bounded groups (the salting that replaces the
            # reference's prime-partition-count trick)
            span_row = corpus.agg(
                F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
            ).collect()[0]
            span = max(int(span_row["hi"] or 0) - int(span_row["lo"] or 0) + 1, 1)
            target_chunks = 4 * max(
                int(spark.conf.get("spark.sql.shuffle.partitions", "32")), num_partitions
            )
            chunk_docs = max(span // target_chunks, 1 << 12)
        m = Manifest(num_partitions=num_partitions, chunk_docs=int(chunk_docs))

    seq = m.committed_seq + 1
    seg_id = f"L0_{seq:06d}_{seq:06d}"
    seg_path = segment_dir(index_dir, seg_id)

    # stage 1 (map): tokenize + tf + local partial posting encode — one
    # vectorized Arrow pass; nothing token-granular ever shuffles
    partial = corpus.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).mapInArrow(
        _make_partial_encoder(num_partitions, int(chunk_docs)), schema=PARTIAL_SCHEMA
    )

    # stage 2 (reduce): merge partials per (term, chunk). Shuffle key
    # (phash, chunk) spreads head-term chunks across tasks; partitionBy
    # below still lays files under the phash= dirs the query side prunes.
    # Rows sorted so the streaming merger sees whole groups and parquet
    # row-group min/max stats on `term` support serving-side pruning (the
    # on-disk analogue of Lucene's term dictionary). Deterministic
    # overwrite => failed builds are rerunnable (reference: removeOutputs
    # before retry, XdiReportDriver.java:167-189).
    enc_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), num_partitions
    )
    # Doclens ride the same pass as the reserved DL_TERM pseudo-term rows
    # (kernels.py) — the whole build is ONE Spark job: scan -> encode ->
    # shuffle -> merge -> write. No second corpus scan, no separate doclens
    # job; this is what keeps fixed per-job cost off the scaling curve.
    #
    # Shuffle key is (phash, salt) where salt = chunk mod n_salt: a head
    # term still fans out over n_salt tasks (memory stays chunk-bounded
    # either way — the kernel streams groups), while each reduce task owns
    # only a few phash values, so partitionBy(phash) writes ~4 files per
    # task instead of one per (task x phash) — ~8x fewer output files, ~8x
    # less driver-side commit work and fewer footers for serving to prune.
    # Key->task placement is explicit (partitioning.even_salted_repartition):
    # hash placement of the ~(P+1)*n_salt keys left measured 3x byte skew
    # and empty tasks in the reduce wave — the dominant scaling-efficiency
    # loss at high core counts.
    n_tasks, n_salt = salted_plan(enc_parts, num_partitions)
    encoded = (
        partial.withColumn("dead", F.lit(None).cast("array<long>"))
        .withColumn("salt", F.pmod(F.col("chunk"), F.lit(n_salt)))
    )
    encoded = (
        even_salted_repartition(encoded, n_tasks, n_salt)
        .sortWithinPartitions("phash", "term", "chunk")
        # stat columns ride from the map side so single-partial groups (the
        # dominant shape: map tasks cover contiguous docid spans) take the
        # kernel's verbatim pass-through — no decode, no re-encode
        .select("phash", "term", "chunk", "df_chunk", "cf_chunk", "max_tf",
                "min_dl", "payload", "dead")
        .mapInPandas(_merge_stream, schema=POSTING_SCHEMA)
    )
    (
        encoded.write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .partitionBy("phash")
        .parquet(os.path.join(seg_path, "postings"))
    )

    if store_fields:
        # ALL corpus columns are stored (text + any keyword fields like
        # lang/source) — Lucene's StoredField surface; field-scoped query
        # clauses (query/parse.parse_query_ext) filter on these
        (
            corpus.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                *[c for c in corpus.columns if c != "doc_id"],
            )
            .repartitionByRange(num_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(seg_path, "docstore"))
        )

    if with_dict:
        write_dictionary(spark, seg_path, num_partitions)

    if with_positions:
        write_positions(spark, seg_path, corpus, num_partitions, int(chunk_docs))

    if index_fields:
        missing = [c for c in index_fields if c not in corpus.columns]
        assert not missing, f"index_fields not in corpus: {missing}"
        write_fields(spark, seg_path, corpus, list(index_fields), num_partitions)

    part_stats, totals = segment_stats(spark, seg_path, num_partitions)
    n_terms = int(sum(r["n_terms"] for r in part_stats))

    meta = SegmentMeta(
        segment_id=seg_id,
        level=0,
        min_seq=seq,
        max_seq=seq,
        n_docs=int(totals["n_docs"]),
        total_tokens=int(totals["total_tokens"] or 0),
        n_terms=int(n_terms),
        n_postings=int(sum(r["n_postings"] for r in part_stats)),
        partitions=[
            {
                "phash": int(r["phash"]),
                "n_terms": int(r["n_terms"]),
                "n_postings": int(r["n_postings"]),
            }
            for r in sorted(part_stats, key=lambda r: r["phash"])
        ],
        lineage=dict(lineage or {}, batch_seq=seq),
        has_docstore=bool(store_fields),
        has_dict=bool(with_dict),
        has_positions=bool(with_positions),
        indexed_fields=sorted(index_fields or []),
    )
    m.segments.append(meta)
    m.committed_seq = seq
    # optimistic concurrency: refuse to clobber a manifest another writer
    # advanced while this build ran (single-writer contract violation)
    commit_manifest(index_dir, m, expect_version=base_version)
    return meta
