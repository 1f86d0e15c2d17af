"""Kernel-level regression tests for _merge_stream's dead-doc masking —
both delivery paths (marker rows with seg_seq, legacy per-row dead column).
Round 6 vectorized the kernel; the dead path is exercised only by real
merges with shadowed docs, so it gets its own direct test against a
per-group reference merge."""

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.index.codec import decode_postings, encode_postings
from lucene_mapreduce_spark.index.kernels import _merge_stream


def _pay(docids, tfs, dls):
    return encode_postings(
        np.asarray(docids, np.uint64),
        np.asarray(tfs, np.uint64),
        np.asarray(dls, np.uint64),
    )


def _run(frames):
    outs = list(_merge_stream(iter(frames)))
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()


def test_marker_rows_mask_shadowed_docs():
    # two segments contribute to the same (term, chunk); seg 1's docs 11/12
    # are shadowed by seg 2 (dead list arrives as a marker row)
    marker = {
        "phash": 3, "term": "", "chunk": 0, "df_chunk": None,
        "cf_chunk": None, "max_tf": None, "min_dl": None, "payload": None,
        "seg_seq": 1, "dead": np.asarray([11, 12], np.int64),
    }
    rows = [
        marker,
        {
            "phash": 3, "term": "tok", "chunk": 0, "df_chunk": 3,
            "cf_chunk": 6, "max_tf": 3, "min_dl": 4,
            "payload": _pay([10, 11, 12], [1, 2, 3], [4, 5, 6]),
            "seg_seq": 1, "dead": None,
        },
        {
            "phash": 3, "term": "tok", "chunk": 0, "df_chunk": 2,
            "cf_chunk": 9, "max_tf": 5, "min_dl": 7,
            "payload": _pay([11, 12], [4, 5], [7, 8]),
            "seg_seq": 2, "dead": None,
        },
    ]
    out = _run([pd.DataFrame(rows)])
    assert len(out) == 1
    d, tf, dl = decode_postings(out["payload"][0])
    assert d.tolist() == [10, 11, 12]
    assert tf.tolist() == [1, 4, 5]  # seg-2 copies win for 11/12
    assert dl.tolist() == [4, 7, 8]
    assert int(out["df_chunk"][0]) == 3
    assert int(out["cf_chunk"][0]) == 10
    assert int(out["max_tf"][0]) == 5
    assert int(out["min_dl"][0]) == 4


def test_marker_row_masks_passthrough_candidate():
    # a single-payload group WITH a dead list must not take the
    # pass-through path: its stats and payload need the rewrite
    marker = {
        "phash": 1, "term": "", "chunk": 7, "df_chunk": None,
        "cf_chunk": None, "max_tf": None, "min_dl": None, "payload": None,
        "seg_seq": 5, "dead": np.asarray([701], np.int64),
    }
    row = {
        "phash": 1, "term": "x", "chunk": 7, "df_chunk": 2,
        "cf_chunk": 5, "max_tf": 3, "min_dl": 2,
        "payload": _pay([700, 701], [2, 3], [2, 9]),
        "seg_seq": 5, "dead": None,
    }
    out = _run([pd.DataFrame([marker, row])])
    assert len(out) == 1
    d, tf, dl = decode_postings(out["payload"][0])
    assert d.tolist() == [700]
    assert int(out["df_chunk"][0]) == 1
    assert int(out["cf_chunk"][0]) == 2
    assert int(out["max_tf"][0]) == 2
    assert int(out["min_dl"][0]) == 2


def test_fully_dead_group_is_dropped():
    marker = {
        "phash": 0, "term": "", "chunk": 1, "df_chunk": None,
        "cf_chunk": None, "max_tf": None, "min_dl": None, "payload": None,
        "seg_seq": 1, "dead": np.asarray([50, 51], np.int64),
    }
    dead_row = {
        "phash": 0, "term": "gone", "chunk": 1, "df_chunk": 2,
        "cf_chunk": 2, "max_tf": 1, "min_dl": 1,
        "payload": _pay([50, 51], [1, 1], [1, 1]),
        "seg_seq": 1, "dead": None,
    }
    live_row = {
        "phash": 0, "term": "kept", "chunk": 1, "df_chunk": 1,
        "cf_chunk": 1, "max_tf": 1, "min_dl": 1,
        "payload": _pay([52], [1], [1]),
        "seg_seq": 2, "dead": None,
    }
    out = _run([pd.DataFrame([marker, live_row, dead_row]).sort_values(
        ["phash", "term", "chunk", "seg_seq"],
    ).reset_index(drop=True)])
    # marker sorts first (term "" < any token); "gone" fully masked
    assert out["term"].tolist() == ["kept"]


def test_legacy_dead_column_build_path():
    # build-path shape: no seg_seq column, per-row dead arrays
    rows = pd.DataFrame(
        {
            "phash": [2, 2],
            "term": ["t", "t"],
            "chunk": [0, 0],
            "payload": [
                _pay([1, 3], [1, 1], [2, 2]),
                _pay([2, 4], [5, 6], [3, 3]),
            ],
            "dead": [None, np.asarray([4], np.uint64)],
        }
    )
    out = _run([rows])
    d, tf, dl = decode_postings(out["payload"][0])
    assert d.tolist() == [1, 2, 3]
    assert tf.tolist() == [1, 5, 1]
    assert int(out["df_chunk"][0]) == 3


def test_dead_mask_across_batch_boundary():
    # marker consumed in batch 1 must mask a row arriving in batch 2
    b1 = pd.DataFrame([
        {
            "phash": 0, "term": "", "chunk": 4, "df_chunk": None,
            "cf_chunk": None, "max_tf": None, "min_dl": None,
            "payload": None, "seg_seq": 1,
            "dead": np.asarray([400], np.int64),
        },
        {
            "phash": 0, "term": "a", "chunk": 4, "df_chunk": 1,
            "cf_chunk": 1, "max_tf": 1, "min_dl": 1,
            "payload": _pay([401], [1], [1]), "seg_seq": 1, "dead": None,
        },
    ])
    b2 = pd.DataFrame([
        {
            "phash": 0, "term": "b", "chunk": 4, "df_chunk": 2,
            "cf_chunk": 3, "max_tf": 2, "min_dl": 1,
            "payload": _pay([400, 402], [1, 2], [1, 1]),
            "seg_seq": 1, "dead": None,
        },
    ])
    out = _run([b1, b2])
    assert out["term"].tolist() == ["a", "b"]
    d, _tf, _dl = decode_postings(out["payload"][1])
    assert d.tolist() == [402]
