"""Round-trip + property tests for the posting-block codec."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_mapreduce_spark.index.codec import (
    BLOCK_SIZE,
    PostingReader,
    decode_postings,
    encode_many,
    encode_postings,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_edges():
    for vals in (
        [],
        [0],
        [127],
        [128],
        [2**7, 2**14, 2**21, 2**28, 2**35, 2**63, 2**64 - 1],
        list(range(1000)),
    ):
        arr = np.array(vals, np.uint64)
        buf, widths = vb_encode(arr)
        out = vb_decode(buf, len(arr))
        assert (out == arr).all()
        assert int(widths.sum()) == len(buf)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=500))
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, np.uint64)
    out = vb_decode(vb_encode(arr)[0], len(arr))
    assert (out == arr).all()


def _rand_postings(n, seed=0, docid_span=10**9):
    rng = np.random.default_rng(seed)
    docids = np.sort(rng.choice(docid_span, size=n, replace=False).astype(np.uint64))
    tfs = rng.integers(1, 50, n).astype(np.uint64)
    dls = rng.integers(1, 500, n).astype(np.uint64)
    return docids, tfs, dls


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 1000, 5000])
def test_postings_roundtrip(n):
    docids, tfs, dls = _rand_postings(n, seed=n)
    buf = encode_postings(docids, tfs, dls)
    d2, t2, l2 = decode_postings(buf)
    assert (d2 == docids).all() and (t2 == tfs).all() and (l2 == dls).all()


def test_skip_table_blockmax():
    n = 1000
    docids, tfs, dls = _rand_postings(n, seed=3)
    r = PostingReader(encode_postings(docids, tfs, dls))
    assert r.n_blocks == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    for i in range(r.n_blocks):
        lo, hi = r.block_bounds(i)
        assert r.skips[i]["last_docid"] == docids[hi - 1]
        assert r.skips[i]["max_tf"] == tfs[lo:hi].max()
        assert r.skips[i]["min_dl"] == dls[lo:hi].min()


def test_non_increasing_docids_rejected():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 5], np.uint64),
            np.array([1, 1], np.uint64),
            np.array([1, 1], np.uint64),
        )


def test_encode_many_matches_single():
    rng = np.random.default_rng(9)
    groups = []
    for g in range(50):
        n = int(rng.integers(1, 400))
        docids = np.sort(rng.choice(10**7, size=n, replace=False).astype(np.uint64))
        tfs = rng.integers(1, 30, n).astype(np.uint64)
        dls = rng.integers(1, 300, n).astype(np.uint64)
        groups.append((docids, tfs, dls))
    cat = lambda i: np.concatenate([g[i] for g in groups])  # noqa: E731
    starts = np.cumsum([0] + [len(g[0]) for g in groups[:-1]])
    many = encode_many(cat(0), cat(1), cat(2), np.array(starts))
    for payload, (d, t, l) in zip(many, groups):
        assert payload == encode_postings(d, t, l)


def test_compression_is_effective():
    # dense docids => ~1 byte per delta; raw int64 would be 8
    docids = np.arange(10_000, dtype=np.uint64) * 3
    tfs = np.ones(10_000, np.uint64)
    dls = np.full(10_000, 30, np.uint64)
    buf = encode_postings(docids, tfs, dls)
    assert len(buf) < 10_000 * 4  # vs 24 bytes/posting raw


def test_decode_postings_many_matches_single():
    from lucene_mapreduce_spark.index.codec import decode_postings_many

    rng = np.random.default_rng(17)
    groups = []
    for g in range(40):
        n = int(rng.integers(0, 500))  # include empty payloads
        docids = np.sort(
            rng.choice(10**9, size=n, replace=False).astype(np.uint64)
        )
        tfs = rng.integers(1, 1 << 20, n).astype(np.uint64)
        dls = rng.integers(1, 1 << 16, n).astype(np.uint64)
        groups.append((docids, tfs, dls))
    payloads = [encode_postings(*g) for g in groups]
    data = np.frombuffer(b"".join(payloads), np.uint8)
    lens = np.array([len(p) for p in payloads], np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    d, tf, dl = decode_postings_many(data, starts, ends)
    exp_d = np.concatenate([g[0] for g in groups]).astype(np.int64)
    exp_tf = np.concatenate([g[1] for g in groups]).astype(np.float64)
    exp_dl = np.concatenate([g[2] for g in groups]).astype(np.float64)
    assert d.dtype == np.int64 and tf.dtype == np.float64
    np.testing.assert_array_equal(d, exp_d)
    np.testing.assert_array_equal(tf, exp_tf)
    np.testing.assert_array_equal(dl, exp_dl)
    # payload-order permutation (the chunk argsort path) must hold too
    perm = rng.permutation(len(groups))
    d2, _tf2, _dl2 = decode_postings_many(data, starts[perm], ends[perm])
    np.testing.assert_array_equal(
        d2, np.concatenate([groups[i][0] for i in perm]).astype(np.int64)
    )


def test_decode_postings_many_empty():
    from lucene_mapreduce_spark.index.codec import decode_postings_many

    d, tf, dl = decode_postings_many(
        np.zeros(0, np.uint8), np.zeros(0, np.int64), np.zeros(0, np.int64)
    )
    assert len(d) == len(tf) == len(dl) == 0


def test_read_payload_meta_matches_struct_parse():
    """Vectorized header/skip parse == per-payload struct.unpack reference,
    across payloads of different block counts sharing one buffer."""
    import struct

    import numpy as np

    from lucene_mapreduce_spark.index.codec import (
        _HEADER,
        _SKIP_DTYPE,
        encode_postings,
        read_payload_meta,
    )

    bufs = []
    for k, n in ((7, 3000), (5, 130), (3, 1)):
        d = np.arange(0, n * k, k, dtype=np.int64)
        bufs.append(encode_postings(d, d % 9 + 1, d % 50 + 20))
    data = np.frombuffer(b"".join(bufs), np.uint8)
    starts, ends, off = [], [], 0
    for b in bufs:
        starts.append(off)
        off += len(b)
        ends.append(off)
    counts, skips = read_payload_meta(data, starts, ends)
    for b, c, sk in zip(bufs, counts, skips):
        magic, ver, count, _bsz, nb = _HEADER.unpack(b[: _HEADER.size])
        assert c == count
        ref = np.frombuffer(
            b[_HEADER.size : _HEADER.size + nb * _SKIP_DTYPE.itemsize],
            _SKIP_DTYPE,
        )
        assert (sk == ref).all()

    # corrupted magic must raise
    bad = bytearray(bufs[0])
    bad[0] = 0
    import pytest

    with pytest.raises(ValueError):
        read_payload_meta(np.frombuffer(bytes(bad), np.uint8), [0], [len(bad)])
