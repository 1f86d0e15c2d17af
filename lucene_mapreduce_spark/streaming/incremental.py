"""Structured-Streaming incremental index build.

The reference's hourly incremental pipeline (IndexBuilder.java: resume from
e_status.txt, consume hours up to the lock service's ready hour, append to
the previous index) maps to Structured Streaming with
``Trigger.AvailableNow``: the checkpoint directory *is* e_status.txt (source
offsets survive restarts), each micro-batch becomes one immutable level-0
segment via foreachBatch, and the segment manifest records batch lineage.
Late/duplicate turns are handled by latest-wins at merge time, exactly like
the batch path — streaming and batch share one build.

Also provides the watermarked windowed aggregation shape (event-time
windows + late-data bound) the reference never had (SURVEY §2.9: "no
event-time windows ... nothing to port there" — we add them anyway because
a transcript pipeline needs them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.datagen.transcripts import TRANSCRIPT_SCHEMA, with_docid
from lucene_mapreduce_spark.index.build import build_segment, latest_wins


def run_incremental_build(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 32,
    merge_when: int | None = None,
    store_fields: bool = False,
    with_dict: bool = False,
    with_positions: bool = False,
    index_fields: list[str] | None = None,
) -> int:
    """Consume all currently-available parquet files under ``input_dir``
    (transcript schema) and append one segment per micro-batch; returns the
    number of batches processed this run. Re-running with the same
    checkpoint only processes NEW files — the streaming analogue of the
    reference's resume-from-last-built-hour.

    ``merge_when``: when set, hierarchically merge once the segment count
    reaches it — the reference's merge cadence ("merge every 2nd hour / at
    day end", IndexBuilder.java:164-176) as a declarative threshold.
    ``store_fields`` / ``with_dict`` / ``with_positions`` enable the
    docstore, term-dictionary, and positional sidecars on every streamed
    segment (they propagate through the cadence merges)."""
    processed = {"n": 0}

    keep = ["doc_id", "text", *(index_fields or [])]

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        corpus = latest_wins(
            with_docid(batch_df).select(*keep, "ts")
        ).select(*keep)
        build_segment(
            batch_df.sparkSession,
            corpus,
            index_dir,
            num_partitions=num_partitions,
            lineage={"stream_batch_id": int(batch_id), "source": input_dir},
            store_fields=store_fields,
            with_dict=with_dict,
            with_positions=with_positions,
            index_fields=index_fields,
        )
        processed["n"] += 1

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if merge_when is not None:
        from lucene_mapreduce_spark.index.manifest import load_manifest
        from lucene_mapreduce_spark.index.merge import merge_all

        m = load_manifest(index_dir)
        if m is not None and len(m.segments) >= merge_when:
            merge_all(spark, index_dir)
    return processed["n"]


def conversation_progress(stream_df: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): tracks
    per-conversation progress — turns seen so far, max turn_idx, latest ts —
    with state carried across micro-batches. This is the streaming analogue
    of the reference's per-key incremental bookkeeping (CookieStability's
    state+delta merge, J5) expressed as a first-class stateful operator
    instead of a self-join against yesterday's output.

    Emits one row per conversation per micro-batch in which it changed.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs, state: GroupState):
        turns, max_turn, last_ts = (
            state.get if state.exists else (0, -1, None)
        )
        for pdf in pdfs:
            turns += len(pdf)
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            ts = pdf["ts"].max()
            last_ts = ts if last_ts is None else max(last_ts, ts)
        state.update((turns, max_turn, last_ts))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turns_seen": [turns],
                "max_turn_idx": [max_turn],
                "last_ts": [last_ts],
            }
        )

    return stream_df.groupBy("conv_id").applyInPandasWithState(
        track,
        outputStructType="conv_id string, turns_seen long, max_turn_idx int, last_ts timestamp",
        stateStructType="turns long, max_turn int, last_ts timestamp",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_GATE_SEQ = [0]


def _finish_gate(spark, q, sink, src, select_cols=None, order_by=None):
    """Await the gate stream, materialize the memory sink into a standalone
    DataFrame, then release the sink table and the temp source dir.

    The memory sink already holds the (bounded) gate result in driver
    memory, so re-materializing via createDataFrame adds nothing; what it
    buys is that the temp view can be dropped and the mkdtemp source
    removed immediately — repeated gate runs in one long session previously
    leaked /tmp disk and driver memory (ADVICE r3)."""
    import os
    import shutil

    q.awaitTermination()
    df = spark.table(sink)
    if select_cols:
        df = df.select(*select_cols)
    if order_by:
        df = df.orderBy(*order_by)
    out = spark.createDataFrame(df.collect(), df.schema)
    spark.catalog.dropTempView(sink)
    shutil.rmtree(os.path.dirname(src), ignore_errors=True)
    return out


def streaming_conversation_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the custom stateful operator: derive a transcript
    stream from the events table (conv = user, turns ranked by ts), run it
    through a REAL Structured Streaming query (parquet source -> the
    applyInPandasWithState operator -> memory sink, Trigger.AvailableNow),
    and return the emitted rows. The input is written as ONE file so the
    run is a single micro-batch, making the update-mode output equal to a
    plain per-conversation aggregate — which the DuckDB oracle replays
    (turns_seen = count, max_turn_idx = count-1, last_ts = max ts)."""
    import os
    import tempfile

    from pyspark.sql import Window

    from lucene_mapreduce_spark.operators.parity import load

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    derived = (
        load(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            "ts",
        )
    )
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"conv_progress_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema(
        "conv_id string, turn_idx int, ts timestamp"
    ).parquet(src)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(
        spark, q, sink, src,
        select_cols=["conv_id", "turns_seen", "max_turn_idx", "last_ts"],
    )


def stream_dedup(stream_df: DataFrame) -> DataFrame:
    """Stateful streaming exact-dedup: first-seen-wins per content hash,
    with the seen-set carried across micro-batches (applyInPandasWithState
    keyed by text_md5). A duplicate arriving hours after the original is
    dropped without re-reading any persisted output — the streaming
    analogue of the batch exact_dedup operator (operators/dedup.py), and
    the dedup stage of a near-real-time ingest pipeline.

    Emits exactly the newly-kept (text_md5, doc_id) rows per batch; within
    a batch the keeper is the smallest doc_id (deterministic regardless of
    arrival order). State per key is one int64 — bounded and shardable by
    the same key the groupBy distributes on.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def keep(key, pdfs, state: GroupState):
        new_min = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                new_min = m if new_min is None else min(new_min, m)
        if state.exists or new_min is None:
            return  # hash already kept in an earlier batch -> drop
        state.update((new_min,))
        yield pd.DataFrame({"text_md5": [key[0]], "doc_id": [new_min]})

    return stream_df.groupBy("text_md5").applyInPandasWithState(
        keep,
        outputStructType="text_md5 string, doc_id long",
        stateStructType="keeper long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the stateful dedup: a real stream run (parquet source
    -> stream_dedup -> memory sink, single micro-batch) over the documents
    table keyed by md5(text); update-mode output equals the batch
    min-doc_id-per-hash aggregate the DuckDB oracle replays."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    derived = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"stream_dedup_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema("doc_id long, text_md5 string").parquet(src)
    q = (
        stream_dedup(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(spark, q, sink, src, select_cols=["text_md5", "doc_id"])


def windowed_turn_counts(stream_df: DataFrame, late: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation over the transcript stream:
    turns per (day, role) with late data admitted up to ``late``."""
    return (
        stream_df.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 day").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("day"), "role", "n_turns")
    )


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the watermarked windowed aggregation: a real stream
    run (parquet source -> watermark + tumbling window -> memory sink) over
    an events-derived stream, single micro-batch so update-mode output
    equals the per-(day, event_type) batch aggregate the oracle replays."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    derived = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("role"), "ts"
    )
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"windowed_counts_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema("role string, ts timestamp").parquet(src)
    q = (
        windowed_turn_counts(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(spark, q, sink, src, select_cols=["day", "role", "n_turns"])


def session_windows(stream_df: DataFrame, gap: str = "1 hour") -> DataFrame:
    """Stateful session-window aggregation: per-user sessions that merge
    events separated by less than ``gap`` (Spark merges an event into a
    session while its ts falls before the session's current end = last
    event + gap; window end is exclusive, so a gap of exactly ``gap``
    starts a new session). The streaming-state twin of the gaps-and-
    islands batch rewrite the oracle replays."""
    return (
        stream_df.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for the session-window operator: a real stream run
    (parquet source -> session_window aggregation -> memory sink) over the
    purchase-event stream. Session windows reject update mode; complete
    mode emits the full merged-session state after the single availableNow
    batch, which equals the batch gaps-and-islands aggregate (session_end
    = last event ts + gap, per Spark's session close semantics)."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    derived = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"session_windows_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        session_windows(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(
        spark, q, sink, src,
        select_cols=["user_id", "session_start", "session_end", "n_events"],
    )


def streaming_percolate(
    spark: SparkSession,
    sf_dir: str,
    queries: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """Streaming percolator — the alert shape end-to-end: documents arrive
    as a stream, a STATIC broadcastable registry of named conjunctive
    queries is joined against each micro-batch, and (query_id, doc_id)
    alert rows append to the sink. The match test is pure codegen
    (array_intersect size == query size on the distinct token set) inside
    a stream-static inner join — stateless, so append mode with no
    watermark; at 100 TB/day this is exactly the saved-search/alerting
    topology (tiny static registry, unbounded doc stream). Batch twin:
    operators/fulltext.percolate_match (same oracle)."""
    import os
    import tempfile

    from lucene_mapreduce_spark.functions.tokenize import (
        tokenize_col,
        tokenize_string,
    )
    from lucene_mapreduce_spark.operators.fulltext import PERCOLATE_QUERIES
    from lucene_mapreduce_spark.operators.parity import load

    queries = queries or PERCOLATE_QUERIES
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_perc_gate_"), "src")
    load(spark, sf_dir, "documents").select("doc_id", "text").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    reg = spark.createDataFrame(
        [(qid, sorted(set(tokenize_string(qtext)))) for qid, qtext in queries],
        "query_id string, q_terms array<string>",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .select("doc_id", F.array_distinct(tokenize_col("text")).alias("toks"))
    )
    joined = stream.join(
        F.broadcast(reg),
        F.size(F.array_intersect("toks", "q_terms")) == F.size("q_terms"),
        "inner",
    ).select("query_id", "doc_id")

    _GATE_SEQ[0] += 1
    sink = f"percolate_gate_{_GATE_SEQ[0]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(spark, q, sink, src, order_by=["query_id", "doc_id"])


STREAM_JOIN_WINDOW_MIN = 60  # purchase attributes to a view within an hour


def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join (the attribution topology:
    which view led to which purchase): two unbounded event streams join
    on user with a bounded event-time range (purchase within
    STREAM_JOIN_WINDOW_MIN minutes after the view). Both sides carry
    watermarks, and the range condition bounds the state Spark must
    retain — the two requirements that make an unbounded×unbounded join
    feasible at all; state per user is one watermark-window of events
    regardless of stream length. Append mode, availableNow — the final
    table equals the batch join (the oracle)."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    src = os.path.join(tempfile.mkdtemp(prefix="lmr_ssj_gate_"), "src")
    load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(["view", "purchase"])
    ).select("event_id", "user_id", "event_type", "ts").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    schema = "event_id long, user_id long, event_type string, ts timestamp"
    views = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "30 minutes")
    )
    purchases = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts")
            + F.expr(f"INTERVAL {STREAM_JOIN_WINDOW_MIN} MINUTES")
        ),
        "inner",
    ).select(F.col("v_user").alias("user_id"), "view_id", "purchase_id")

    _GATE_SEQ[0] += 1
    sink = f"stream_join_gate_{_GATE_SEQ[0]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(
        spark, q, sink, src, order_by=["user_id", "view_id", "purchase_id"]
    )


TOPK_KEYS_K = 3


def windowed_topk_keys(stream_df: DataFrame, late: str = "1 hour") -> DataFrame:
    """Watermarked per-day heavy-key counting over the event stream: the
    streaming HALF of a windowed top-k — counts per (day, k) accumulate in
    streaming state (map-side combinable, watermark-bounded); the rank cut
    happens at serve time on the materialized buckets, because Spark
    (correctly) refuses non-time window functions over an unbounded
    stream. Same split ES makes: shards stream counts, the coordinator
    ranks."""
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        stream_df.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 day").alias("w"), k.alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "k", "n")
    )


def streaming_topk_keys(
    spark: SparkSession, sf_dir: str, topk: int = TOPK_KEYS_K
) -> DataFrame:
    """Gate entry for streaming windowed top-k: a real stream run
    (parquet source -> watermark + tumbling-day count per JSON key k ->
    memory sink, availableNow single batch), then the top-`topk` keys per
    day ranked (n desc, k asc) over the bounded materialized buckets.
    The day surfaces as a date string (NTZ-safe, both engines)."""
    import os
    import tempfile

    from pyspark.sql import Window

    from lucene_mapreduce_spark.operators.parity import load

    derived = load(spark, sf_dir, "events").select("props", "ts")
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"topk_keys_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema("props string, ts timestamp").parquet(src)
    q = (
        windowed_topk_keys(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    buckets = _finish_gate(spark, q, sink, src, select_cols=["day", "k", "n"])
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("k"))
    return (
        buckets.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("k").cast("int").alias("k"),
            F.col("n").cast("long").alias("n"),
            "rank",
        )
        .orderBy("day", "rank")
    )


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for dropDuplicatesWithinWatermark — the bounded-state
    streaming dedup (state for a key expires once the watermark passes it,
    unlike stream_dedup's grow-forever seen-set; this is the operator a
    24/7 ingest actually runs). A real stream run: parquet events source
    -> 1h watermark on ts -> dropDuplicatesWithinWatermark(user_id,
    event_type) -> append-mode memory sink, availableNow. Only the key
    columns are projected on output: WHICH duplicate row survives is
    arrival-order-defined (engine nondeterminism by contract), the key
    SET is exact — so the gate compares the key set, and the DuckDB twin
    is a plain DISTINCT."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    derived = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"dedup_wm_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        deduped.select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(spark, q, sink, src, select_cols=["user_id", "event_type"])


def streaming_percolate_range(
    spark: SparkSession,
    sf_dir: str,
    queries: tuple[tuple[str, str, int, int], ...] | None = None,
) -> DataFrame:
    """Streaming percolator with mixed clause types: the stored queries
    carry a conjunctive terms MUST plus a numeric n_chars range FILTER
    (operators/fulltext.percolate_range_match is the batch twin and
    shares the oracle). Same topology as streaming_percolate — static
    broadcast registry, stateless stream-static inner join, append mode,
    no watermark — with the range predicate fused into the join
    condition, exactly how a saved-search alert with a length guard runs
    against an unbounded doc stream."""
    import os
    import tempfile

    from lucene_mapreduce_spark.functions.tokenize import (
        tokenize_col,
        tokenize_string,
    )
    from lucene_mapreduce_spark.operators.fulltext import PERCOLATE_RANGE_QUERIES
    from lucene_mapreduce_spark.operators.parity import load

    queries = queries or PERCOLATE_RANGE_QUERIES
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_percr_gate_"), "src")
    load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    reg = spark.createDataFrame(
        [
            (qid, sorted(set(tokenize_string(qtext))), lo, hi)
            for qid, qtext, lo, hi in queries
        ],
        "query_id string, q_terms array<string>, lo long, hi long",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, n_chars long")
        .parquet(src)
        .select(
            "doc_id",
            "n_chars",
            F.array_distinct(tokenize_col("text")).alias("toks"),
        )
    )
    joined = stream.join(
        F.broadcast(reg),
        (F.size(F.array_intersect("toks", "q_terms")) == F.size("q_terms"))
        & (F.col("n_chars") >= F.col("lo"))
        & (F.col("n_chars") < F.col("hi")),
        "inner",
    ).select("query_id", "doc_id")

    _GATE_SEQ[0] += 1
    sink = f"percolate_range_gate_{_GATE_SEQ[0]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(spark, q, sink, src, order_by=["query_id", "doc_id"])


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry for SLIDING windowed aggregation (window duration 2h,
    slide 1h — each event lands in exactly two overlapping windows; the
    tumbling gate covers the duration == slide case): watermarked stream
    -> F.window(ts, '2 hours', '1 hour') x event_type counts -> memory
    sink, availableNow single micro-batch so update mode equals the
    batch aggregate. Oracle: each event expands to its two epoch-aligned
    window starts (hour h and h-1) in SQL. Window starts are cast to
    STRING both sides (the date_histogram rule)."""
    import os
    import tempfile

    from lucene_mapreduce_spark.operators.parity import load

    derived = load(spark, sf_dir, "events").select("event_type", "ts")
    src = os.path.join(tempfile.mkdtemp(prefix="lmr_stream_gate_"), "src")
    derived.coalesce(1).write.mode("overwrite").parquet(src)

    _GATE_SEQ[0] += 1
    sink = f"sliding_counts_gate_{_GATE_SEQ[0]}"
    stream = spark.readStream.schema("event_type string, ts timestamp").parquet(
        src
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    q = (
        agg.select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return _finish_gate(
        spark,
        q,
        sink,
        src,
        select_cols=["window_start", "event_type", "n_events"],
        order_by=["window_start", "event_type"],
    )
