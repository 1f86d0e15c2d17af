"""Deduplication operators over the `documents` table.

The reference's only dedup is first-wins by exact key (ParserHandler.java:
126-130) and DISTINCT (copy_fields_for_index.pig:67). A training-data
pipeline at 100 TB needs the whole family; each operator here is expressed
as declarative DataFrame ops and has a DuckDB oracle twin (oracles.py) —
hash functions are md5-based *strings* so Spark and DuckDB agree bit-for-bit
(no engine-specific numeric hashes in any oracle-checked path).

Scale notes: every self-join goes through a shingle/bucket key (never a
cross join); candidate generation is O(shared-bucket pairs); Zipf-skewed
shingle keys are the classic hot spot — the `max_bucket` caps below drop
degenerate buckets exactly like production LSH pipelines do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_col
from lucene_mapreduce_spark.operators.parity import load

N_MINHASH = 12
LSH_BANDS = 4  # 4 bands x 3 rows
SHINGLE_K = 3


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per md5(text) = min doc_id (deterministic
    winner, unlike the reference's arrival-order first-wins). One shuffle
    with map-side partial min."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct token 3-grams per doc."""
    toks = tokenize_col("text")
    idx = F.sequence(F.lit(1), F.size(toks) - (SHINGLE_K - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    return (
        docs.filter(F.size(toks) >= SHINGLE_K)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over 3-gram shingles.

    Candidate pairs come from the shingle inverted index (self-equi-join on
    shingle) — never a cross join; intersection counts fall out of the join,
    union sizes from per-doc shingle counts.
    """
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: sig_i(doc) = min over shingles of
    md5(i || ':' || shingle). Lexicographic min over an md5 hex string is a
    valid uniform min-hash; md5 keeps Spark and DuckDB bit-identical."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    hashed = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("i"),
        F.col("shingle"),
    ).select(
        "doc_id",
        "i",
        F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "i").agg(F.min("h").alias("sig"))


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding: signatures grouped into LSH_BANDS bands of
    N_MINHASH/LSH_BANDS rows; docs sharing any band key become candidate
    pairs (then exact-verified downstream by ngram_jaccard_pairs at scale).
    The band key is itself md5(banded sigs) — short join keys, skew-safe."""
    sigs = minhash_signatures(spark, sf_dir)
    rows_per_band = N_MINHASH // LSH_BANDS
    banded = (
        sigs.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("i", "sig"))),
                        lambda x: F.concat_ws(":", x["i"].cast("string"), x["sig"]),
                    ),
                    "|",
                )
            ).alias("band_key")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(spark: SparkSession, sf_dir: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprints: bit j of the fingerprint is the sign of the
    tf-weighted sum of (2*parity(md5(token) hex digit j) - 1) over tokens.
    A 32-bit md5-derived hash family — identical in Spark and DuckDB.
    """
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokenize_col("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5("token"))
    )
    per_bit = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        F.col("tf"),
        F.col("h"),
    ).select(
        "doc_id",
        "j",
        (
            F.col("tf")
            * F.when(
                F.substr(F.col("h"), F.col("j") + 1, F.lit(1)).isin(
                    "1", "3", "5", "7", "9", "b", "d", "f"
                ),
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias("w"),
    )
    bitvals = (
        per_bit.groupBy("doc_id", "j")
        .agg(F.sum("w").alias("s"))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), j) "
                "ELSE CAST(0 AS BIGINT) END"
            ).alias("bit"),
        )
    )
    return bitvals.groupBy("doc_id").agg(F.sum("bit").alias("simhash"))


def simhash_near_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 6) -> DataFrame:
    """Near-dup candidates by SimHash hamming distance, bucketed by 8-bit
    bands (a pair within hamming<=6 over 32 bits shares >=1 of 4 bands by
    pigeonhole when distance < 4... kept exact here by verifying the
    distance after the band join)."""
    sh = simhash(spark, sf_dir).cache()
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "band_val", F.expr("shiftright(simhash, band * 8) & CAST(255 AS BIGINT)")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
