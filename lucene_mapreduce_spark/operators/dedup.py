"""Deduplication operators over the `documents` table.

The reference's only dedup is first-wins by exact key (ParserHandler.java:
126-130) and DISTINCT (copy_fields_for_index.pig:67). A training-data
pipeline at 100 TB needs the whole family; each operator here is expressed
as declarative DataFrame ops and has a DuckDB oracle twin (oracles.py) —
hash functions are md5-based *strings* so Spark and DuckDB agree bit-for-bit
(no engine-specific numeric hashes in any oracle-checked path).

Scale notes: every self-join goes through a shingle/bucket key (never a
cross join); candidate generation is O(shared-bucket pairs); Zipf-skewed
shingle keys are the classic hot spot — `_cap_buckets` drops degenerate
buckets (> MAX_BUCKET members) before every self-join, so per-bucket pair
counts are bounded at any corpus size (a shingle present in half of 10^12
docs contributes zero candidate pairs instead of 10^23). SimHash is 64-bit
with 16-bit bands: 65,536 bucket values per band keeps bucket population
~N/65k — the 8-bit-band variant (256 buckets) goes quadratic per bucket at
10^9+ docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_col
from lucene_mapreduce_spark.operators.parity import load

N_MINHASH = 12
LSH_BANDS = 4  # 4 bands x 3 rows
SHINGLE_K = 3
MAX_BUCKET = 100  # drop join keys shared by more docs than this (skew cap)


def _cap_buckets(df: DataFrame, key_cols: list[str], max_bucket: int) -> DataFrame:
    """Drop rows whose join-key bucket exceeds max_bucket members — the
    standard hot-key guard for LSH/shingle self-joins (a degenerate bucket
    of B docs would emit B^2/2 pairs). Window count + filter: one extra
    shuffle on the same key the join uses, map-side combinable."""
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__bn", F.count(F.lit(1)).over(w))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )


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


EVAL_MOD = 97


def contamination_check(
    spark: SparkSession,
    sf_dir: str,
    eval_mod: int = EVAL_MOD,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any token 3-gram
    with the held-out eval split — the n-gram-overlap contamination test
    an LLM data pipeline runs before training. The eval split here is the
    deterministic doc_id % eval_mod == 0 slice (stand-in for an external
    benchmark table; the plan is identical with any eval DataFrame). The
    join is a plain shingle-key equi-join (AQE broadcasts the eval side
    when it is benchmark-sized, shuffles when the "eval" slice is large —
    never a forced broadcast of an unbounded side); hot shingles are
    capped before the join like every shingle self-join (a stop-shingle
    carries no contamination signal). Output per contaminated training
    doc: how many eval docs it overlaps and how many (shingle, eval_doc)
    matches."""
    docs = load(spark, sf_dir, "documents")
    sh = _cap_buckets(_shingles(docs), ["shingle"], max_bucket)
    ev = sh.filter(F.col("doc_id") % eval_mod == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    tr = sh.filter(F.col("doc_id") % eval_mod != 0).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    return (
        tr.join(ev, "shingle")
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.count(F.lit(1)).alias("n_shared"),
        )
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over 3-gram shingles.

    Candidate pairs come from the shingle inverted index (self-equi-join on
    shingle) — never a cross join; intersection counts fall out of the join,
    union sizes from per-doc shingle counts. Shingles present in more than
    max_bucket docs are dropped BEFORE the join (stop-shingle filtering):
    one Zipf-head shingle would otherwise emit a quadratic pair blowup, and
    a shingle shared by >100 docs carries no near-dup signal anyway.
    Jaccard is computed over the capped shingle universe on both sides of
    the fraction (sizes come from the same filtered set).
    """
    docs = load(spark, sf_dir, "documents")
    sh = _cap_buckets(_shingles(docs), ["shingle"], max_bucket)
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
        # sizes is doc-cardinality (unbounded at corpus scale) — plain
        # key joins; AQE broadcasts when the capped pair set is small
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
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
    valid uniform min-hash; md5 keeps Spark and DuckDB bit-identical.

    Shuffle shape: ONE groupBy over the shingle rows with N_MINHASH min
    aggregates (map-side combinable) — never an explode x N_MINHASH row
    blowup; the wide row then unpivots to the (doc_id, i, sig) contract
    after aggregation (stack is per-row, no shuffle)."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    wide = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"s{i}")
            for i in range(N_MINHASH)
        ]
    )
    stack = ", ".join(f"{i}, s{i}" for i in range(N_MINHASH))
    return wide.selectExpr(
        "doc_id", f"stack({N_MINHASH}, {stack}) AS (i, sig)"
    ).select("doc_id", F.col("i").cast("int").alias("i"), "sig")


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """MinHash + LSH banding: signatures grouped into LSH_BANDS bands of
    N_MINHASH/LSH_BANDS rows; docs sharing any band key become candidate
    pairs (then exact-verified downstream by ngram_jaccard_pairs at scale).
    The band key is itself md5(banded sigs) — high-cardinality join keys —
    and band buckets over max_bucket members (byte-identical doc clusters)
    are dropped before the self-join, bounding pair output per bucket."""
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
    banded = _cap_buckets(banded, ["band", "band_key"], max_bucket)
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


def simhash(spark: SparkSession, sf_dir: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprints, stored as two 32-bit halves
    (simhash_hi = bits 32..63, simhash_lo = bits 0..31). Bit j's sign comes
    from the tf-weighted sum of hex-digit parities of
    md5('0:'||token) || md5('1:'||token) — an md5-derived family identical
    in Spark and DuckDB (two halves because a BIGINT 1<<63 overflows
    DuckDB's checked shift; 2x32 also gives natural 16-bit band slices).

    64 bits is the production width: hamming<=k near-dup detection over
    32 bits saturates at web scale (too many unrelated docs collide)."""
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokenize_col("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "h",
            F.concat(
                F.md5(F.concat(F.lit("0:"), F.col("token"))),
                F.md5(F.concat(F.lit("1:"), F.col("token"))),
            ),
        )
    )
    # ONE groupBy with `bits` signed-tf sums (map-side combinable) instead
    # of an explode x bits row blowup — 64x less shuffle volume; the sums
    # are exact integers so the fingerprint is unchanged
    odd = ("1", "3", "5", "7", "9", "b", "d", "f")
    sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", j + 1, 1).isin(*odd), F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    hi = None
    lo = None
    for j in range(bits):
        bit = F.when(
            F.col(f"s{j}") > 0,
            F.shiftleft(F.lit(1).cast("long"), j % 32),
        ).otherwise(F.lit(0).cast("long"))
        if j < 32:
            lo = bit if lo is None else lo + bit
        else:
            hi = bit if hi is None else hi + bit
    return sums.select(
        "doc_id", hi.alias("simhash_hi"), lo.alias("simhash_lo")
    )


def simhash_near_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 12,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup candidates by 64-bit SimHash hamming distance, bucketed by
    FOUR 16-BIT BANDS (65,536 bucket values per band — bucket population
    stays ~N/65k at any corpus size; 8-bit bands go quadratic per bucket
    beyond 10^9 docs). Candidates from the band equi-join (guaranteed
    complete for hamming < 4 by pigeonhole, probabilistic above), verified
    with the exact distance; degenerate buckets are capped."""
    from lucene_mapreduce_spark.session import persist_bounded

    sh = persist_bounded(simhash(spark, sf_dir))
    # band 0,1 from the low half (bits 0-15, 16-31); band 2,3 from the high
    banded = sh.select(
        "doc_id",
        "simhash_hi",
        "simhash_lo",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            "shiftright(CASE WHEN band < 2 THEN simhash_lo ELSE simhash_hi END, "
            "pmod(band, 2) * 16) & CAST(65535 AS BIGINT)"
        ),
    )
    banded = _cap_buckets(banded, ["band", "band_val"], max_bucket)
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
            F.col("a.simhash_hi").alias("hi_a"),
            F.col("a.simhash_lo").alias("lo_a"),
            F.col("b.simhash_hi").alias("hi_b"),
            F.col("b.simhash_lo").alias("lo_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


DUP_NGRAM_K = 5


def _positional_grams(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, gram): one row per token k-gram POSITION (multiplicity
    kept, unlike ``_shingles``) — the unit of the substring-duplication
    measure below."""
    toks = tokenize_col("text")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    return docs.filter(F.size(toks) >= k).select(
        "doc_id", F.explode(grams).alias("gram")
    )


def duplicate_ngram_fraction(
    spark: SparkSession, sf_dir: str, k: int = DUP_NGRAM_K, min_df: int = 2
) -> DataFrame:
    """Per-doc duplicated-substring signal at token k-gram granularity —
    the distributed stand-in for suffix-array exact substring dedup (Lee
    et al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): the fraction of a doc's k-gram positions whose k-gram also
    occurs in >= min_df distinct documents. Pipelines drop or trim docs
    with a high fraction (boilerplate, licenses, templated spam).

    Plan shape (all map-side combinable, no self-join): one groupBy(gram)
    over the DISTINCT (doc, gram) set for document frequency, an equi-join
    of the positional gram stream against the (small-ish) duplicated-gram
    set, and a per-doc count rollup. Hot grams (boilerplate present in
    millions of docs) are exactly the ones flagged — they join to ONE row
    each, so skew is bounded; nothing is ever broadcast or collected.
    Reference has no analogue (nearest is DISTINCT, copy_fields_for_index
    .pig:67); this is LLM-pipeline surface beyond the reference."""
    docs = load(spark, sf_dir, "documents")
    g = _positional_grams(docs, k)
    dup = (
        g.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .filter(F.col("gdf") >= min_df)
        .select("gram")
    )
    total = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    dupped = (
        g.join(dup, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_grams"))
    )
    return (
        total.join(dupped, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.round(
                F.coalesce("n_dup_grams", F.lit(0))
                / F.col("n_grams").cast("double"),
                6,
            ).alias("dup_fraction"),
        )
    )


CONTAM_FRACTION = 0.05  # contaminated if >= 5% of a doc's 3-grams are shared


def contamination_fraction(
    spark: SparkSession,
    sf_dir: str,
    eval_mod: int = EVAL_MOD,
    threshold: float = CONTAM_FRACTION,
) -> DataFrame:
    """Fraction-based decontamination (the overlap-RATIO method modern
    pipelines use instead of contamination_check's any-shared-shingle
    flag): a training doc is contaminated when >= threshold of its
    DISTINCT token 3-grams appear anywhere in the eval split. The eval
    side collapses to a distinct shingle SET before the join (a semi-join
    — per-eval-doc attribution doesn't matter for the ratio, so no hot-
    shingle blowup is possible), the per-doc denominator rides the same
    shingle frame. Reports every doc over threshold with its ratio."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    ev = (
        sh.filter(F.col("doc_id") % eval_mod == 0)
        .select("shingle")
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % eval_mod != 0)
    totals = tr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    shared = (
        tr.join(ev, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        totals.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
        .withColumn(
            "frac",
            F.round(
                F.col("n_shared").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ),
        )
        .filter(F.col("frac") >= threshold)
        .orderBy("doc_id")
    )


WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (consecutive k-grams per min-selection)
WINNOW_CAP = 512  # pinned prefix cap: fingerprint the first 512 chars only
WINNOW_TOPN = 10


def winnowing_dup_candidates(
    spark: SparkSession,
    sf_dir: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    cap: int = WINNOW_CAP,
    topn: int = WINNOW_TOPN,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
    local document fingerprinting algorithm, public): md5 every char
    k-gram (stride 1), take the minimum hash of each w-window of
    consecutive k-grams, keep the distinct minima as the doc's fingerprint
    set. Docs sharing a fingerprint are near-dup candidates; output the
    topn hottest fingerprints with doc counts and the min doc_id witness.

    The text is capped at a pinned 512-char prefix: at 100 TB the
    fingerprint count per doc must be bounded by contract, not by the data
    (MOSS itself windows long files). Guarantee kept within the cap: any
    shared substring of length >= k + w - 1 chars yields a shared
    fingerprint. All pure built-in expressions (transform / slice /
    array_min / array_distinct — JVM codegen); the only shuffle is the
    fingerprint groupBy, which is md5-uniform (no hot keys beyond true
    duplicates). Distinct from doc_fingerprint (global min, stride 4):
    winnowing guarantees LOCAL coverage, so partial overlaps are caught."""
    # Repartition BEFORE the fingerprint projection: per row this is the
    # heaviest expression in the repo (~500 md5 + ~500 window minima), and
    # a small parquet input (one ~20 MB file at the 10x gate) otherwise
    # yields 1-2 scan partitions — one task ground ~25M md5 calls
    # single-threaded for the whole sf1 corpus. At 100 TB the scan has
    # thousands of partitions naturally; this keeps the small-input case
    # honest. Row-local projection, so the shuffle changes nothing else.
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    body = F.substring(F.col("text"), 1, cap)
    n = F.length(body)
    hashes = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.md5(F.substr(body, i, F.lit(k))),
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.size(hashes) - F.lit(w - 1)),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    fps = (
        docs.where(n >= F.lit(k + w - 1))
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
    )
    hot = fps.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("witness_doc_id"),
    )
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    return ranked_topk(
        hot.where(F.col("n_docs") >= 2),
        [F.desc("n_docs"), F.asc("fp")],
        topn,
    ).select("fp", "n_docs", "witness_doc_id", "rank")


def minhash_jaccard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit (the dedup twin of ann_recall_at_k): for
    every exact near-dup pair (3-gram Jaccard >= 0.5, the
    ngram_jaccard_pairs truth set), the MinHash-estimated Jaccard —
    fraction of equal signature components — and its absolute error.
    Continuous-audit shape: the truth pairs are few (planted dups), so
    the signature join is pair-bounded, never corpus-quadratic; at scale
    you run it over a sampled pair set with identical plans."""
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    sigs = minhash_signatures(spark, sf_dir)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "i", F.col("sig").alias("sig_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "i", F.col("sig").alias("sig_b")
    )
    est = (
        F.broadcast(pairs)
        .join(sa, "doc_a")
        .join(sb, ["doc_b", "i"])
        .groupBy("doc_a", "doc_b", "jaccard")
        .agg(
            F.round(
                F.sum((F.col("sig_a") == F.col("sig_b")).cast("int"))
                / F.lit(float(N_MINHASH)),
                6,
            ).alias("mh_est")
        )
    )
    return est.select(
        "doc_a",
        "doc_b",
        "jaccard",
        "mh_est",
        F.round(F.abs(F.col("mh_est") - F.col("jaccard")), 6).alias("abs_err"),
    ).orderBy("doc_a", "doc_b")


STITCH_K = 4  # tokens compared at the seam


def chunk_stitch_candidates(
    spark: SparkSession, sf_dir: str, k: int = STITCH_K
) -> DataFrame:
    """Chunking-artifact detection: pairs (a, b) where doc a's LAST k
    tokens equal doc b's FIRST k tokens — the signature of one source
    document split into consecutive chunks by an ingestion pipeline
    (stitch a+b back together before training, or drop the seam dup).
    Two md5 seam keys per doc, one equi-join on the key — never a
    substring scan; md5-uniform join keys, so no skew beyond true
    stitch groups."""
    docs = load(spark, sf_dir, "documents")
    toks = tokenize_col("text")
    base = docs.where(F.size(toks) >= k).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(toks, 1, k))).alias("head_key"),
        F.md5(
            F.concat_ws(" ", F.slice(toks, F.size(toks) - F.lit(k - 1), k))
        ).alias("tail_key"),
    )
    tails = base.select(F.col("doc_id").alias("doc_a"), F.col("tail_key").alias("key"))
    heads = base.select(F.col("doc_id").alias("doc_b"), F.col("head_key").alias("key"))
    return (
        tails.join(heads, "key")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "key")
        .orderBy("doc_a", "doc_b")
    )


def near_dup_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate leakage matrix: the verified near-dup
    pairs (ngram_jaccard_pairs, exact 3-gram Jaccard >= 0.5) rolled up by
    UNORDERED source pair — the curation report that says which domains
    are mirroring each other (off-diagonal cells) vs self-duplicating
    (diagonal). Pair set is dup-bounded; two dimension joins + one
    two-key groupBy."""
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    sa = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    sb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("source_lo", "source_hi")
    )


CONTAINMENT_THRESHOLD = 0.8


def containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = CONTAINMENT_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """DIRECTIONAL near-dup detection by one-way shingle containment
    (Broder 1997's containment, the quote/subset signal symmetric Jaccard
    misses: a short doc fully embedded in a long one has low Jaccard but
    containment ~1.0 — exactly the quote/boilerplate-inclusion case a
    training-data pipeline must catch for decontamination and source
    attribution):

        C(src -> dst) = |S(src) ∩ S(dst)| / |S(src)|

    Candidates come from the same capped shingle inverted-index self-join
    as ngram_jaccard_pairs (hot shingles dropped BEFORE the join — never
    all-pairs); each undirected candidate emits up to two directed rows.
    Counts are integers, the single division rounds 6dp."""
    docs = load(spark, sf_dir, "documents")
    sh = _cap_buckets(_shingles(docs), ["shingle"], max_bucket)
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
    both = inter.join(sa, "doc_a").join(sb, "doc_b")
    fwd = both.select(
        F.col("doc_a").alias("doc_src"),
        F.col("doc_b").alias("doc_dst"),
        F.round(F.col("n_inter") / F.col("n_a"), 6).alias("containment"),
    )
    rev = both.select(
        F.col("doc_b").alias("doc_src"),
        F.col("doc_a").alias("doc_dst"),
        F.round(F.col("n_inter") / F.col("n_b"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


def simhash_hamming_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-distance histogram over the SimHash candidate pairs — the
    threshold-tuning curve for simhash_near_pairs (where to cut
    max_hamming is read off this distribution: a bimodal histogram
    separates true near-dups from band-collision noise). One bounded
    groupBy over the verified candidate output."""
    pairs = simhash_near_pairs(spark, sf_dir)
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("hamming")
    )


TOP_DUP_NGRAM_N = 5
TOP_DUP_NGRAM_K = 10


def top_duplicate_ngrams(
    spark: SparkSession,
    sf_dir: str,
    n: int = TOP_DUP_NGRAM_N,
    k: int = TOP_DUP_NGRAM_K,
) -> DataFrame:
    """The top-k token {n}-grams appearing in MORE THAN ONE document — the
    boilerplate detector that names the offending strings (headers,
    licenses, navigation chrome) before a remove-duplicated-substrings
    pass; duplicate_ngram_fraction measures the per-doc damage, this op
    ranks the causes corpus-wide. df counts distinct docs per gram; only
    df >= 2 rank. One explode + two map-side-combinable groupBys +
    TakeOrderedAndProject."""
    from lucene_mapreduce_spark.operators.parity import ranked_topk

    docs = load(spark, sf_dir, "documents")
    grams = _positional_grams(docs, n).select("doc_id", "gram").distinct()
    dfs = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dup = dfs.filter(F.col("df") >= 2)
    return ranked_topk(dup, [F.desc("df"), F.asc("gram")], k).select(
        "gram", "df", "rank"
    )


# --- batch 38: blocked edit-distance verification ---------------------------

LEV_PREFIX_LEN = 32
LEV_MAX_DIST = 16
LEV_BLOCK_CAP = 64  # hot-block guard: pairs per prefix block are capped


def levenshtein_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance near-dup verification over prefix-blocked
    candidates: docs sharing their first 32 chars pair up (the classic
    cheap blocking key for templated/prefix-stable near-dups), each pair
    is verified with full Levenshtein (JVM built-in, identical DP in both
    engines — cross-checked), and pairs within LEV_MAX_DIST are emitted.
    Scale shape: the self-join runs INSIDE prefix blocks only; block
    sizes are bounded by the dup-cluster size (and defensively capped at
    LEV_BLOCK_CAP pairs per block via the a-side rank) — never an
    all-pairs comparison. The O(len^2) DP cost is paid only on
    already-blocked candidates, the standard verify stage of a
    blocking+verify dedup pipeline (MinHash/SimHash are the probabilistic
    siblings; this is the exact-distance variant)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, LEV_PREFIX_LEN).alias("pfx")
    )
    a = docs.select(
        F.col("pfx"),
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
    )
    b = docs.select(
        F.col("pfx").alias("pfx_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
    )
    w = Window.partitionBy("pfx").orderBy("doc_a", "doc_b")
    pairs = (
        a.join(b, (a.pfx == b.pfx_b) & (a.doc_a < b.doc_b))
        .withColumn("pair_rank", F.row_number().over(w))
        .filter(F.col("pair_rank") <= LEV_BLOCK_CAP)
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= LEV_MAX_DIST)
        .orderBy("doc_a", "doc_b")
    )


# --- batch 52: source overlap matrix + LSH band operating points --------------

OVERLAP_MAX_SOURCES_PER_SHINGLE = 100  # skew cap on the shingle self-join
LSH_SWEEP_CONFIGS = ((2, 6), (3, 4), (4, 3), (6, 2), (12, 1))  # (bands, rows)
LSH_SWEEP_TAU = 0.5  # exact-jaccard threshold defining a true duplicate pair


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional source-to-source shingle containment: for each ordered
    source pair (a, b), |shingles(a) ∩ shingles(b)| / |shingles(a)| — the
    cross-source contamination matrix a data-mix audit reads (a source
    largely contained in another adds little; a mirror shows up as a
    near-1.0 row). Shingle sets collapse to DISTINCT (shingle, source)
    first, so the self-join key cardinality is bounded by the source
    count per shingle (capped, like every dedup join here) — never
    doc-pair-shaped. Group count = |sources|²."""
    docs = load(spark, sf_dir, "documents")
    ss = (
        _shingles(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("shingle", "source")
        .distinct()
    )
    capped = (
        ss.withColumn(
            "ns", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .filter(F.col("ns") <= OVERLAP_MAX_SOURCES_PER_SHINGLE)
        .drop("ns")
    )
    sizes = capped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("source", "source_a").withColumnRenamed(
                "n_shingles", "size_a"
            ),
            "source_a",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double") / F.col("size_a").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


def lsh_band_sweep(
    spark: SparkSession,
    sf_dir: str,
    configs: tuple = LSH_SWEEP_CONFIGS,
    tau: float = LSH_SWEEP_TAU,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """LSH banding operating points: for every (bands, rows_per_band)
    factorization of the N_MINHASH signature, the candidate-pair count
    and the precision against exact shingle Jaccard >= tau — the curve a
    dedup deployment consults to pick its band shape (more bands = higher
    recall & more candidates; the s-curve threshold is (1/b)^(1/r)).
    Exact verification runs ONCE over the union of all configs'
    candidates (semi-join-restricted shingle intersection — never
    corpus-wide all-pairs), then each config joins its own candidate set
    against the verdicts. Plan: the signature groupBy is shared; per
    config one banded groupBy + capped self-join, same shape the
    production minhash_lsh_pairs path runs."""
    from functools import reduce

    sigs = minhash_signatures(spark, sf_dir).persist()
    per_config = []
    for bands, rows in configs:
        assert bands * rows == N_MINHASH
        banded = (
            sigs.withColumn("band", (F.col("i") / rows).cast("int"))
            .groupBy("doc_id", "band")
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.sort_array(F.collect_list(F.struct("i", "sig"))),
                            lambda x: F.concat_ws(
                                ":", x["i"].cast("string"), x["sig"]
                            ),
                        ),
                        "|",
                    )
                ).alias("band_key")
            )
        )
        banded = _cap_buckets(banded, ["band", "band_key"], max_bucket)
        a = banded.alias("a")
        b = banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
            .withColumn("bands", F.lit(bands))
            .withColumn("rows_per_band", F.lit(rows))
        )
        per_config.append(pairs)
    allc = reduce(lambda x, y: x.unionByName(y), per_config).persist()
    uni = allc.select("doc_a", "doc_b").distinct()
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs)
    cand_docs = (
        uni.select(F.col("doc_a").alias("doc_id"))
        .unionByName(uni.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = shc.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shc.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        uni.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verdicts = (
        uni.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter")).cast("double")
                >= F.lit(tau)
            ).alias("is_true"),
        )
    )
    out = (
        allc.join(verdicts, ["doc_a", "doc_b"])
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("is_true"), 1).otherwise(0))
            .cast("long")
            .alias("n_true"),
        )
        .select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_true",
            F.round(
                F.col("n_true").cast("double") / F.col("n_candidates").cast("double"),
                6,
            ).alias("precision"),
        )
        .orderBy("bands")
    )
    rows_out = out.collect()
    sigs.unpersist()
    allc.unpersist()
    return spark.createDataFrame(
        rows_out,
        "bands int, rows_per_band int, n_candidates long, n_true long,"
        " precision double",
    )


def dup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement audit between the two signature-based near-dup
    detectors — the calibration table a dedup pipeline publishes before
    trusting either alone: MinHash-LSH candidate pairs vs SimHash band
    pairs, intersected on (doc_a, doc_b) (both emit doc_a < doc_b, so
    the join is direct). Disagreement rows are where the methods see
    different geometry (token-set Jaccard vs weighted-feature cosine).
    One full-outer join over two already-bounded candidate sets; all
    integers plus one rounded Jaccard."""
    a = minhash_lsh_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_a")
    )
    b = simhash_near_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_b")
    )
    j = a.join(b, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum(F.coalesce("in_a", F.lit(0))).cast("long").alias("n_minhash"),
        F.sum(F.coalesce("in_b", F.lit(0))).cast("long").alias("n_simhash"),
        F.sum(
            (F.col("in_a").isNotNull() & F.col("in_b").isNotNull()).cast("int")
        )
        .cast("long")
        .alias("n_both"),
        F.round(
            F.sum(
                (F.col("in_a").isNotNull() & F.col("in_b").isNotNull()).cast(
                    "int"
                )
            ).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("jaccard"),
    )


TFIDF_RESCORE_TOP_K = 20


def lsh_tfidf_cosine_rescore(
    spark: SparkSession, sf_dir: str, k: int = TFIDF_RESCORE_TOP_K
) -> DataFrame:
    """Two-stage lexical similarity join (Bayardo et al., WWW'07 shape:
    cheap candidate generation + exact scoring, never all-pairs): the
    MinHash-LSH candidate pairs re-scored with EXACT tf-idf cosine.
    Weights w = tf · (1 + ln(N/(df+1))) (the ClassicSimilarity idf
    tfidf_topk pins); per-doc norms and per-pair dot products sum
    12dp-rounded DECIMAL(28,12) contributions (order-free — a raw
    grouped double sum would be partition-order-dependent); the final
    cosine is one double expression, ranked on the ROUNDED score.
    Pair-scoring volume is |candidates| x shared-terms, bounded by the
    LSH stage at any corpus size."""
    from lucene_mapreduce_spark.functions.tokenize import tokenize_col
    from lucene_mapreduce_spark.operators.parity import load, ranked_topk

    docs = load(spark, sf_dir, "documents")
    postings = (
        docs.select("doc_id", F.explode(tokenize_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = docs.count()
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = F.col("tf") * (
        F.lit(1.0)
        + F.log(F.lit(float(n_docs)) / (F.col("df").cast("double") + F.lit(1.0)))
    )
    weighted = postings.join(F.broadcast(dft), "term").select(
        "doc_id", "term", w.alias("w")
    )
    norms = (
        weighted.select(
            "doc_id",
            F.round(F.col("w") * F.col("w"), 12)
            .cast("decimal(28,12)")
            .alias("w2"),
        )
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum("w2").cast("double")).alias("norm"))
    )
    cand = minhash_lsh_pairs(spark, sf_dir)
    dots = (
        cand.join(
            weighted.select(
                F.col("doc_id").alias("doc_a"),
                "term",
                F.col("w").alias("wa"),
            ),
            "doc_a",
        )
        .join(
            weighted.select(
                F.col("doc_id").alias("doc_b"),
                F.col("term"),
                F.col("w").alias("wb"),
            ),
            ["doc_b", "term"],
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("wa") * F.col("wb"), 12)
            .cast("decimal(28,12)")
            .alias("p"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("p").cast("double").alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("na")),
            "doc_a",
        )
        .join(
            norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
    return ranked_topk(
        scored, [F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b")], k
    ).select("doc_a", "doc_b", "cosine", "rank")


def bbit_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit MinHash audit (Li & Koenig 2010, b=1): each of the
    N_MINHASH signature components keeps only ONE BIT (parity of the
    md5 sig's last hex digit), shrinking the sketch 128x; Jaccard is
    recovered from the bit-collision rate as max(0, 2*c/K - 1) —
    unbiased because non-equal minhashes collide on a random bit with
    probability 1/2. Audited against the exact 3-gram Jaccard on the
    same truth pairs as minhash_jaccard_audit; with K=12 the estimate
    is deliberately coarse — the audit is the evidence for how much
    resolution one bit per component buys at 1/128 the sketch bytes.
    Pair-bounded joins throughout."""
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    sigs = minhash_signatures(spark, sf_dir).select(
        "doc_id",
        "i",
        (
            F.conv(F.substring(F.col("sig"), 32, 1), 16, 10).cast("int")
            % 2
        ).alias("bit"),
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "i", F.col("bit").alias("bit_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "i", F.col("bit").alias("bit_b")
    )
    est = (
        F.broadcast(pairs)
        .join(sa, "doc_a")
        .join(sb, ["doc_b", "i"])
        .groupBy("doc_a", "doc_b", "jaccard")
        .agg(
            F.sum((F.col("bit_a") == F.col("bit_b")).cast("int"))
            .cast("long")
            .alias("c")
        )
    )
    bbit = F.greatest(
        F.lit(0.0),
        F.lit(2.0) * F.col("c").cast("double") / F.lit(float(N_MINHASH))
        - F.lit(1.0),
    )
    return est.select(
        "doc_a",
        "doc_b",
        "jaccard",
        "c",
        F.round(bbit, 6).alias("bbit_est"),
        F.round(F.abs(bbit - F.col("jaccard")), 6).alias("abs_err"),
    ).orderBy("doc_a", "doc_b")


def simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash sketch-health audit: the per-bit 1-fraction across the
    corpus's 64-bit simhashes — a healthy hash family sits near 0.5 on
    every bit; systematic bias on a bit position weakens the hamming
    estimator simhash_near_pairs relies on. Reuses the exact simhash()
    column; bit extraction is integer shift/mask codegen; one 64-row
    aggregate. Reports each bit's ones count plus the corpus max
    deviation from 0.5."""
    sigs = simhash(spark, sf_dir).select(
        "doc_id", "simhash_hi", "simhash_lo"
    )
    n = sigs.count()  # scalar
    # shiftright's Column-shift overload throws NOT_ITERABLE (the hll
    # trap) — enumerate the 64 literal shifts explicitly instead
    bit_cols = [
        F.shiftright(
            F.col("simhash_lo") if i < 32 else F.col("simhash_hi"),
            i % 32,
        )
        .bitwiseAND(F.lit(1))
        .cast("int")
        for i in range(64)
    ]
    bits = sigs.select(
        F.posexplode(F.array(*bit_cols)).alias("bit", "val")
    )
    per_bit = bits.groupBy("bit").agg(
        F.sum("val").cast("long").alias("ones")
    )
    return per_bit.select(
        "bit",
        "ones",
        F.round(
            F.col("ones").cast("double") / F.lit(float(n)), 6
        ).alias("ones_frac"),
        F.round(
            F.abs(
                F.col("ones").cast("double") / F.lit(float(n))
                - F.lit(0.5)
            ),
            6,
        ).alias("bias"),
    ).orderBy("bit")


def source_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level MinHash: each SOURCE's signature component i is the
    min of md5(i:shingle) over every shingle the source contains — the
    group-level merge of the per-doc signatures (min is associative:
    the source sketch IS the fold of its docs' sketches, the
    mergeability that lets 1000 executors sketch partitions
    independently). Pairwise source similarity estimates
    (signature-agreement fraction) sit next to the exact shingle-set
    Jaccard per pair. Source-count-bounded everything after the one
    shingle scan."""
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    ).select("source", "shingle").distinct()
    wide = sh.groupBy("source").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))
            ).alias(f"s{i}")
            for i in range(N_MINHASH)
        ],
        F.count(F.lit(1)).cast("long").alias("n_sh"),
    )
    a = wide.select(
        F.col("source").alias("sa"),
        F.col("n_sh").alias("na"),
        *[F.col(f"s{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = wide.select(
        F.col("source").alias("sb"),
        F.col("n_sh").alias("nb"),
        *[F.col(f"s{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    match = None
    for i in range(N_MINHASH):
        m = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        match = m if match is None else match + m
    pairs = a.join(b, F.col("sa") < F.col("sb")).select(
        "sa",
        "sb",
        "na",
        "nb",
        F.round(
            match.cast("double") / F.lit(float(N_MINHASH)), 6
        ).alias("mh_estimate"),
    )
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("sa"), F.col("y.source").alias("sb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        pairs.join(inter, ["sa", "sb"], "left")
        .select(
            "sa",
            "sb",
            F.coalesce("n_inter", F.lit(0)).cast("long").alias("n_inter"),
            F.round(
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("n_inter", F.lit(0))).cast(
                    "double"
                ),
                6,
            ).alias("exact_jaccard"),
            "mh_estimate",
        )
        .orderBy("sa", "sb")
    )
