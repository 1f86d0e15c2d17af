"""Deterministic synthetic multi-turn transcript corpus (input_hint schema).

Schema (exactly the mandated input table shape):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp

Properties engineered in (FIXTURES.md §1):
- Zipfian vocabulary => head-term skew, mirroring the key skew the reference
  mitigates with prime partition counts (reference: IndexBuilderDriver.java:46
  "change to prime number"); our build handles it with docid-range chunking.
- ts monotone within a conversation, spanning multiple build dates so
  generation / TTL logic is exercised (reference SLOT_SIZE=3,
  conf/config.properties:3).
- empty-text rows, repeated tokens, unicode + odd-whitespace edge cases.
- fully seeded numpy generation: the same (seed, n_conv) always produces the
  same bytes — "no external data", reproducible at any scale factor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "bash", "python", "browser", "none"])

# TURN_BITS fixes the (conv, turn) -> int64 docid packing; 2^20 turns per
# conversation is far above any real transcript length.
TURN_BITS = 20


def _vocab(n_terms: int) -> np.ndarray:
    return np.array([f"tok{i:05d}" for i in range(n_terms)])


def gen_transcripts_pandas(
    n_conv: int = 200,
    seed: int = 42,
    mean_turns: int = 8,
    vocab_size: int = 2000,
    zipf_a: float = 1.3,
    mean_tokens: int = 24,
    start_ts: str = "2026-01-01",
    n_days: int = 9,
) -> pd.DataFrame:
    """Generate the corpus as pandas (vectorized, seeded)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)

    turns_per_conv = 1 + rng.poisson(mean_turns - 1, size=n_conv)
    conv_idx = np.repeat(np.arange(n_conv), turns_per_conv)
    n_rows = len(conv_idx)
    turn_idx = np.concatenate([np.arange(t) for t in turns_per_conv])

    tok_counts = rng.poisson(mean_tokens, size=n_rows)
    # Edge cases: ~2% empty turns, a few whitespace-only / unicode turns.
    tok_counts[rng.random(n_rows) < 0.02] = 0

    total_toks = int(tok_counts.sum())
    draws = rng.zipf(zipf_a, size=total_toks)
    draws = np.minimum(draws - 1, vocab_size - 1)

    # Vectorized text assembly: token gather + per-row space-join in Arrow
    # C++ (byte-identical to the per-row " ".join loop it replaces, which
    # profiled as ~2/3 of the whole generator).
    import pyarrow as pa
    import pyarrow.compute as pc

    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(tok_counts, out=offsets[1:])
    flat = pc.take(pa.array(vocab), pa.array(draws.astype(np.int64)))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), flat)
    texts = pc.binary_join(lists, " ").to_numpy(zero_copy_only=False)

    # Sprinkle deterministic oddities.
    odd = rng.choice(n_rows, size=max(1, n_rows // 100), replace=False)
    oddities = np.array(
        ["  ", "tok00001\ttok00002\n tok00001", "naïve café 東京 tok00003", "\x0btok00004\x0b"],
        dtype=object,
    )
    texts[odd] = oddities[np.arange(len(odd)) % len(oddities)]

    # ts: conversation start spread over n_days, +37s per turn (monotone).
    base = pd.Timestamp(start_ts)
    conv_start_s = rng.integers(0, n_days * 86400, size=n_conv)
    ts = (
        base
        + pd.to_timedelta(conv_start_s[conv_idx], unit="s")
        + pd.to_timedelta(turn_idx * 37, unit="s")
    )

    roles = _ROLES[turn_idx % 2 + rng.integers(0, 1, size=n_rows)]  # user/assistant alternate
    roles = np.where(turn_idx == 0, "system", roles)
    tools = _TOOLS[rng.integers(0, len(_TOOLS), size=n_rows)].astype(object)
    tools[tools == "none"] = None

    # conv labels built once per conversation, gathered per row (the
    # per-row np.char pass was 8x the work for identical strings)
    conv_labels = np.char.add(
        "conv_", np.char.zfill(np.arange(n_conv).astype(str), 8)
    )
    return pd.DataFrame(
        {
            "conv_id": conv_labels[conv_idx],
            "turn_idx": turn_idx.astype("int32"),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def transcripts_df(spark: SparkSession, n_conv: int = 200, seed: int = 42, **kw) -> DataFrame:
    """Corpus as a Spark DataFrame (Arrow-converted from the seeded pandas gen).

    At real scale the same generator logic would run distributed via
    ``spark.range(n_conv).mapInPandas(...)`` — provided as
    ``transcripts_df_distributed`` for the bench path.
    """
    pdf = gen_transcripts_pandas(n_conv=n_conv, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def transcripts_df_distributed(
    spark: SparkSession,
    n_conv: int,
    seed: int = 42,
    partitions: int | None = None,
    **kw,
) -> DataFrame:
    """Distributed generator: each partition generates its conv range with a
    per-partition derived seed — no driver-side materialization, scales to
    arbitrary n_conv (this is how the 10^12-turn bench corpus would be made)."""
    import pandas as _pd  # noqa: F401  (closure imports for executor side)

    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi, part_seed = int(row["lo"]), int(row["hi"]), int(row["seed"])
                out = gen_transcripts_pandas(n_conv=hi - lo, seed=part_seed, **kw)
                # re-base conv ids to the partition's global range: conv ids
                # are emitted in ascending first-occurrence order, so a
                # factorize + per-conv label rebuild replaces the per-row
                # string parse (identical strings, ~10x less work)
                import numpy as _np
                codes = _pd.factorize(out["conv_id"])[0]
                labels = _np.char.add(
                    "conv_",
                    _np.char.zfill((_np.arange(hi - lo) + lo).astype(str), 8),
                )
                out["conv_id"] = labels[codes]
                yield out

    bounds = [
        (i * n_conv // partitions, (i + 1) * n_conv // partitions, seed + 7919 * i)
        for i in range(partitions)
    ]
    # EXACTLY one bounds row per partition: parallelize slices the list
    # positionally. (A hash repartition of tiny bounds rows collides — some
    # partitions get 2-4 conversation ranges, others 0 — and the resulting
    # 4x input-split skew turns into a straggler task that caps stage
    # scaling at any core count.)
    plan = spark.createDataFrame(
        spark.sparkContext.parallelize(bounds, partitions),
        "lo long, hi long, seed long",
    )
    return plan.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def pack_docid(conv_num_col, turn_idx_col):
    """(conv number, turn_idx) -> int64 docid: conv_num << TURN_BITS | turn_idx.

    Deterministic across cluster sizes (SURVEY.md §7.3 hard part 4) — never
    ``monotonically_increasing_id``.
    """
    from pyspark.sql import functions as F

    return (
        F.shiftleft(conv_num_col.cast("long"), TURN_BITS)
        + turn_idx_col.cast("long")
    ).cast("long")


def with_docid(df: DataFrame) -> DataFrame:
    """Add the packed int64 ``doc_id`` to a transcripts DataFrame."""
    from pyspark.sql import functions as F

    conv_num = F.substring("conv_id", 6, 10).cast("long")
    return df.withColumn(
        "doc_id", pack_docid(conv_num, F.col("turn_idx"))
    )
