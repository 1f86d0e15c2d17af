"""Real codecs through the multimodal mapInPandas seam (VERDICT r4 item 2).

The gate queries (media_decode_stats / media_frame_stats) stay on the
md5-derived payload so the DuckDB oracle can verify closed-form; these tests
prove the marked swap points actually run REAL decoders:

  - DEFLATE: compress_media -> decode_features(codec="deflate") runs
    zlib.decompress inside the kernel. Reference shape: stored payloads are
    deflated and inflated at query time (XdiReportReducer.java:369, Lucene
    CompressionTools == java.util.zip == zlib).
  - RIFF/WAVE: encode_wav emits genuine .wav containers; decode_wav_features
    parses them with stdlib `wave` inside the kernel.
"""
from __future__ import annotations

import io
import wave
import zlib

import pytest

from lucene_mapreduce_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=30, seed=11).cache()


def test_deflate_real_decompress_through_seam(spark, media):
    comp = mm.compress_media(media).cache()

    # the stored blobs really are zlib streams: smaller-or-equal, and
    # driver-side zlib.decompress inverts them byte-for-byte
    raw = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    for r in comp.collect():
        blob = bytes(r["data"])
        assert blob[:16] == raw[r["media_id"]][:16]  # header stays raw
        assert zlib.decompress(blob[16:]) == raw[r["media_id"]][16:]
        assert blob[16:] != raw[r["media_id"]][16:]  # actually transformed

    # the kernel itself decompresses: features off the deflate path must
    # equal features off the raw path exactly (same ints, same float exprs)
    f_raw = (
        mm.decode_features(media).toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    f_z = (
        mm.decode_features(comp, codec="deflate").toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    assert f_raw.equals(f_z)
    assert len(f_z) == 30 and (f_z.n_bytes > 0).all()


def test_deflate_unknown_codec_rejected(media):
    with pytest.raises(ValueError):
        mm.decode_features(media, codec="lz4")


def test_wav_real_container_roundtrip(spark, media):
    wavs = mm.encode_wav(media).cache()
    audio = media.filter("kind = 'audio'")
    assert wavs.count() == audio.count() > 0

    # blobs are genuine RIFF/WAVE files: container magic + stdlib wave parse
    raw = {
        r["media_id"]: (bytes(r["data"]), r["rate"]) for r in audio.collect()
    }
    for r in wavs.collect():
        blob = bytes(r["wav"])
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        payload, rate = raw[r["media_id"]]
        with wave.open(io.BytesIO(blob), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getframerate() == rate * 1000
            assert w.readframes(w.getnframes()) == payload[16:]

    # kernel-side decode: stats from the parsed container match stats the
    # raw-path kernel computes from the same payload bytes
    dec = (
        mm.decode_wav_features(wavs).toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    f_raw = (
        mm.decode_features(audio).toPandas()
        .sort_values("media_id").reset_index(drop=True)
    )
    assert list(dec.media_id) == list(f_raw.media_id)
    assert list(dec.n_samples) == list(f_raw.n_bytes)
    assert list(dec.sum_bytes) == list(f_raw.sum_bytes)
    assert list(dec.mean_val) == list(f_raw.mean_val)
    assert all(
        fr == raw[mid][1] * 1000
        for mid, fr in zip(dec.media_id, dec.framerate)
    )
