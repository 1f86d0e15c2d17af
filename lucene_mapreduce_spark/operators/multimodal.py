"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` columns with a
typed metadata struct, and runs decode / feature-extract / resize /
frame-sample as Arrow-batched kernels (mapInPandas) so bytes never round-trip
through Python row-at-a-time. The image/audio codec libraries are not in
this container, so the *image/video codec* is a deterministic fake over a
16-byte header (documented below) — the Spark-side plumbing (schemas,
batching, partitioning, kernel signatures) is real and tested; swapping the
fake for PIL/pyav/soundfile changes only the marked lines inside each kernel.

TWO REAL CODECS do run through the mapInPandas seam (stdlib, tested in
tests/test_multimodal_codec.py):
  - DEFLATE: compress_media() zlib-compresses payloads and
    decode_features(codec="deflate") zlib-DECOMPRESSES them inside the
    kernel before feature extraction — the exact shape of the reference's
    stored-payload decompress at query time (XdiReportReducer.java:369,
    Lucene CompressionTools == java.util.zip Deflater == zlib).
  - RIFF/WAVE: encode_wav() writes genuine WAV containers (8-bit mono PCM)
    and decode_wav_features() parses them with stdlib `wave` inside the
    kernel — a real container-format decode, not a header fake.

Fake media format (deterministic, seeded from media_id):
  bytes 0-3   magic b"FMED"
  bytes 4-7   width  (uint32 LE)   [images/video]
  bytes 8-11  height (uint32 LE)   [images/video]
  bytes 12-15 n_frames or sample_rate (uint32 LE)
  bytes 16+   payload (pseudo-random uint8, length = w*h or n_samples)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"FMED"

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "width int, height int, rate int"
)


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
        rate = int(rng.integers(2, 9))  # n_frames (video) / kHz (audio)
        if kind == "image":
            payload_len = w * h
        elif kind == "video":
            payload_len = w * h * rate
        else:
            payload_len = rate * 1000
        payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
        data = MAGIC + struct.pack("<III", w, h, rate) + payload
        rows.append((i, kind, bytearray(data), w, h, rate))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _parse_header(buf: bytes) -> tuple[int, int, int]:
    assert buf[:4] == MAGIC, "bad media payload"
    return struct.unpack("<III", buf[4:16])


def decode_features(media: DataFrame, codec: str = "raw") -> DataFrame:
    """Decode + feature-extract kernel: (media_id, kind, n_bytes, sum_bytes,
    mean_val, std_val). The np.frombuffer line is where a real decoder goes —
    and with codec="deflate" a REAL one runs: stdlib zlib.decompress inside
    the Arrow-batched kernel (pair with compress_media; the reference's
    stored-payload decompress shape, XdiReportReducer.java:369).

    mean/std derive from EXACT integer sums (sum, sum-of-squares fit in
    int64 for any realistic payload) through a fixed float expression —
    mean = s/n, std = sqrt(sq/n - (s/n)*(s/n)) — so a SQL oracle evaluating
    the identical expression on the identical integers is bit-identical
    (np.mean/np.std would pairwise-sum and 1-ulp-diverge)."""
    import math
    import zlib

    if codec not in ("raw", "deflate"):
        raise ValueError(f"unknown codec {codec!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, nb, sb, mean_v, std_v = [], [], [], [], [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                _parse_header(data)
                if codec == "deflate":  # <- real decode: zlib DEFLATE
                    arr = np.frombuffer(
                        zlib.decompress(bytes(data[16:])), np.uint8
                    )
                else:
                    arr = np.frombuffer(data, np.uint8, offset=16)  # <- real decode here
                n = len(arr)
                s = int(arr.sum(dtype=np.int64))
                sq = int((arr.astype(np.int64) ** 2).sum())
                ids.append(mid)
                kinds.append(kind)
                nb.append(n)
                sb.append(s)
                mean_v.append(s / n if n else 0.0)
                std_v.append(
                    math.sqrt(sq / n - (s / n) * (s / n)) if n else 0.0
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "n_bytes": nb, "sum_bytes": sb,
                 "mean_val": mean_v, "std_val": std_v}
            )

    return media.select("media_id", "kind", "data").mapInPandas(
        kernel,
        schema=(
            "media_id long, kind string, n_bytes long, sum_bytes long, "
            "mean_val double, std_val double"
        ),
    )


def compress_media(media: DataFrame, level: int = 6) -> DataFrame:
    """DEFLATE-compress payloads via stdlib zlib inside the mapInPandas seam.

    The 16-byte header stays raw (so schema/partition pruning on metadata
    never touches compressed bytes); payload bytes 16+ become a zlib stream.
    Pairs with decode_features(codec="deflate") for a real
    compress→store→decompress round trip — the reference stores payloads
    deflated and inflates at query time (XdiReportReducer.java:369, Lucene
    CompressionTools; java.util.zip Deflater IS zlib)."""
    import zlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, blobs = [], [], []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                _parse_header(data)
                blobs.append(bytes(data[:16]) + zlib.compress(bytes(data[16:]), level))
                ids.append(mid)
                kinds.append(kind)
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "data": blobs})

    return media.select("media_id", "kind", "data").mapInPandas(
        kernel, schema="media_id long, kind string, data binary"
    )


def encode_wav(media: DataFrame) -> DataFrame:
    """Encode audio payloads as genuine RIFF/WAVE containers (8-bit mono
    unsigned PCM, framerate = rate kHz) via stdlib `wave` inside the kernel.
    Output blobs are real .wav files any player parses."""
    import io
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, _, rate = _parse_header(data)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)  # 8-bit PCM: sample bytes == payload bytes
                    w.setframerate(rate * 1000)
                    w.writeframes(bytes(data[16:]))
                ids.append(mid)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "wav": blobs})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "data")
        .mapInPandas(kernel, schema="media_id long, wav binary")
    )


def decode_wav_features(wavs: DataFrame) -> DataFrame:
    """REAL container decode: parse RIFF/WAVE blobs with stdlib `wave`
    inside the mapInPandas kernel — params from the container header, sample
    stats from the decoded frames (same exact-integer-sum float expression
    as decode_features)."""
    import io
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rates, sb, mean_v = [], [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["wav"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    assert w.getnchannels() == 1 and w.getsampwidth() == 1
                    n = w.getnframes()
                    frames = w.readframes(n)
                    # capture inside the with-block: Wave_read retaining
                    # attributes after close() is a CPython detail
                    rate = w.getframerate()
                arr = np.frombuffer(frames, np.uint8)
                s = int(arr.sum(dtype=np.int64))
                ids.append(mid)
                ns.append(n)
                rates.append(rate)
                sb.append(s)
                mean_v.append(s / n if n else 0.0)
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "framerate": rates,
                 "sum_bytes": sb, "mean_val": mean_v}
            )

    return wavs.mapInPandas(
        kernel,
        schema=(
            "media_id long, n_samples long, framerate long, "
            "sum_bytes long, mean_val double"
        ),
    )


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Resize kernel: block-mean downsample of the fake image raster to
    (out_w, out_h); emits a new binary in the same format. Real deployments
    replace the numpy reshape/mean with PIL.Image.resize."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                w, h, rate = _parse_header(data)
                arr = np.frombuffer(data, np.uint8, offset=16)[: w * h]
                img = arr.reshape(h, w)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                small = np.zeros((out_h, out_w), np.uint8)
                for yi in range(out_h):
                    for xi in range(out_w):
                        block = img[ys[yi]: max(ys[yi + 1], ys[yi] + 1),
                                    xs[xi]: max(xs[xi + 1], xs[xi] + 1)]
                        small[yi, xi] = int(block.mean())
                blob = MAGIC + struct.pack("<III", out_w, out_h, rate) + small.tobytes()
                ids.append(mid)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "data": blobs})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "data")
        .mapInPandas(kernel, schema="media_id long, data binary")
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents` doc_ids — the
    oracle-checkable face of the family. Payload bytes are ASCII md5 hex
    chains, so a SQL engine can verify the DECODED statistics closed-form
    while the Spark side exercises the real binary plumbing (blob assembly,
    header parse, Arrow-batched decode kernels):

      kind  = (image, audio, video)[doc_id % 3]
      image/audio: payload = md5(str(doc_id)) hex ASCII, repeated
                   r = 1 + doc_id % 4 times      (w=8, h=4r, rate=r)
      video:       rate = 2 + doc_id % 5 frames; frame f's 32 bytes are
                   md5(str(doc_id*1000 + f)) hex ASCII (w=8, h=4)
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, blobs, ws, hs, rates = [], [], [], [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                if kind == "video":
                    rate = 2 + did % 5
                    payload = b"".join(
                        hashlib.md5(str(did * 1000 + f).encode())
                        .hexdigest()
                        .encode()
                        for f in range(rate)
                    )
                    w, h = 8, 4
                else:
                    rate = 1 + did % 4
                    payload = hashlib.md5(str(did).encode()).hexdigest().encode() * rate
                    w, h = 8, 4 * rate
                ids.append(did)
                kinds.append(kind)
                blobs.append(MAGIC + struct.pack("<III", w, h, rate) + payload)
                ws.append(w)
                hs.append(h)
                rates.append(rate)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "data": blobs,
                 "width": ws, "height": hs, "rate": rates}
            )

    return docs.select("doc_id").mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame byte statistics over sample_frames output (exact integer
    sums; same oracle-matched float expression as decode_features)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, nb, sb, mean_v = [], [], [], [], []
            for mid, fidx, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame"]
            ):
                arr = np.frombuffer(frame, np.uint8, offset=16)
                n = len(arr)
                s = int(arr.sum(dtype=np.int64))
                ids.append(mid)
                idxs.append(fidx)
                nb.append(n)
                sb.append(s)
                mean_v.append(s / n if n else 0.0)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_bytes": nb,
                 "sum_bytes": sb, "mean_val": mean_v}
            )

    return frames.mapInPandas(
        kernel,
        schema="media_id long, frame_idx int, n_bytes long, sum_bytes long, mean_val double",
    )


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: decode + feature-extract over the document-derived media
    table; every stat is oracle-verified closed-form from md5(doc_id)."""
    from pyspark.sql import functions as F  # noqa: F811

    from lucene_mapreduce_spark.operators.parity import load

    media = media_from_documents(load(spark, sf_dir, "documents"))
    out = decode_features(media)
    return out.select(
        "media_id", "kind", "n_bytes", "sum_bytes",
        F.round("mean_val", 6).alias("mean_val"),
        F.round("std_val", 6).alias("std_val"),
    )


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: video frame-sampling (stride 2) + per-frame stats over
    the document-derived media table, oracle-verified closed-form."""
    from pyspark.sql import functions as F  # noqa: F811

    from lucene_mapreduce_spark.operators.parity import load

    media = media_from_documents(load(spark, sf_dir, "documents"))
    out = frame_stats(sample_frames(media, every=2))
    return out.select(
        "media_id", "frame_idx", "n_bytes", "sum_bytes",
        F.round("mean_val", 6).alias("mean_val"),
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling kernel for video: one output row per sampled frame
    (media_id, frame_idx, frame binary). Real deployments replace the
    stride slice with a container demuxer (pyav)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                w, h, n_frames = _parse_header(data)
                arr = np.frombuffer(data, np.uint8, offset=16)
                for f in range(0, n_frames, every):
                    frame = arr[f * w * h: (f + 1) * w * h]
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(MAGIC + struct.pack("<III", w, h, 1) + frame.tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "data")
        .mapInPandas(kernel, schema="media_id long, frame_idx int, frame binary")
    )
