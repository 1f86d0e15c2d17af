"""Source/sink parity tests (SURVEY §2.1): gzip text scan, TSV sink,
compressed output, multi-format round-trips, result/remain two-sink."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from lucene_mapreduce_spark.functions.tokenize import tokenize_col


def test_gzip_text_scan(spark, tmp_path):
    """S3 — the reference reads vendor diff_*.gz with TextInputFormat
    (XdiReportDriver.java:253-266); spark.read.text handles the codec."""
    p = tmp_path / "diff_0.gz"
    with gzip.open(p, "wt") as f:
        for i in range(100):
            f.write(f"key{i:03d}\x01value{i}\n")
    df = spark.read.text(str(p))
    assert df.count() == 100
    parsed = df.select(F.split("value", "\x01").alias("w")).select(
        F.col("w").getItem(0).alias("k"), F.col("w").getItem(1).alias("v")
    )
    rows = {r["k"]: r["v"] for r in parsed.collect()}
    assert rows["key007"] == "value7"


def test_tsv_sink_roundtrip(spark, sf_dir, tmp_path):
    """S8 — TsvOutputFormat (class missing from the reference tree,
    TTLFilterDriver.java:14) == csv writer with tab sep."""
    out = str(tmp_path / "tsv")
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df.write.option("sep", "\t").option("header", True).mode("overwrite").csv(out)
    back = spark.read.option("sep", "\t").option("header", True).csv(out)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_gzip_compressed_output(spark, sf_dir, tmp_path):
    """S9 — job-level gzip output compression (CookieStability.java:176-177;
    Pig output compression lib/xdi_file_gen.pig:14-17)."""
    out = str(tmp_path / "gz")
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    df.write.option("compression", "gzip").mode("overwrite").json(out)
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert files, os.listdir(out)
    assert spark.read.json(out).count() == df.count()


def test_text_sink_kv_lines(spark, tmp_path):
    """S6 — TextOutputFormat key/value lines (IndexBuilderDriver.java:50-52)."""
    out = str(tmp_path / "txt")
    df = spark.createDataFrame([(i, i * i) for i in range(10)], "k int, v int")
    df.select(F.concat_ws("\t", "k", "v").alias("value")).write.mode(
        "overwrite"
    ).text(out)
    back = spark.read.text(out).select(F.split("value", "\t").alias("w"))
    assert back.count() == 10


def test_max_records_per_file(spark, sf_dir, tmp_path):
    """S9's file-sizing concern (Pig maxCombinedSplitSize 1GB,
    xdi_file_gen.pig:6-8) == maxRecordsPerFile."""
    out = str(tmp_path / "sized")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = df.count()
    df.coalesce(1).write.option("maxRecordsPerFile", 100).mode("overwrite").parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= n // 100


def test_sequencefile_scan(spark, tmp_path):
    """S1 — the reference's hourly input is SequenceFile (Text, Text)
    (IndexBuilderDriver.java:49); sc.sequenceFile reads it natively."""
    p = str(tmp_path / "seq")
    sc = spark.sparkContext
    sc.parallelize([(f"k{i}", f"v{i}\tm{i}\tb{i}") for i in range(50)], 2).saveAsSequenceFile(p)
    rdd = sc.sequenceFile(p)
    df = spark.createDataFrame(rdd, "key string, value string")
    parsed = df.select(F.split("value", "\t").alias("w")).select(
        F.col("w").getItem(1).alias("mid")
    )
    assert parsed.count() == 50
    assert parsed.filter(F.col("mid") == "m7").count() == 1


def test_tokenizer_on_read_text(spark, tmp_path):
    """S1-ish end-to-end: raw text lines -> tokenize -> countable tokens."""
    p = tmp_path / "lines.txt"
    p.write_text("a b c\nd e\n")
    n = (
        spark.read.text(str(p))
        .select(F.explode(tokenize_col("value")).alias("t"))
        .count()
    )
    assert n == 5


def test_load_seam_dispatches_iceberg(monkeypatch):
    """The corpus loader is the single seam for the Iceberg read surface:
    with SPARK_GRAFT_CORPUS_FORMAT=iceberg it must issue
    read.format("iceberg").load("<ns>.<table>") — verified with a stub
    reader since this sandbox ships no iceberg runtime jar."""
    from lucene_mapreduce_spark.operators.parity import load

    calls = {}

    class _Reader:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def load(self, path):
            calls["path"] = path
            return "DF"

    class _Spark:
        read = _Reader()

    monkeypatch.setenv("SPARK_GRAFT_CORPUS_FORMAT", "iceberg")
    assert load(_Spark(), "lake.corpus", "documents") == "DF"
    assert calls == {"format": "iceberg", "path": "lake.corpus.documents"}
