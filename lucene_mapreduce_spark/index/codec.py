"""Posting-block codec: delta + variable-byte + skip pointers + block-max.

The reference stores its per-key payload as a deflate-compressed Lucene
stored field (IndexBuilderReducer.java:158 ``CompressionTools.compress``) and
lets Lucene 4 own the posting format. Our engine owns the format:

payload := header | skip table | docid stream | tf stream | dl stream

- docids: strictly increasing int64, delta-encoded then varbyte
- tf, dl: varbyte (dl inlined so every block is self-contained — scoring
  never needs a side lookup of document norms)
- blocks of ``BLOCK_SIZE`` postings; per block the skip table holds
  (last_docid, byte offsets of each stream, max_tf, min_dl)
- block-max: score(t,d) <= idf * (k1+1)*max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl))
  for ANY avgdl, because tf-normalization is increasing in tf and decreasing
  in dl — storing (max_tf, min_dl) keeps upper bounds valid across merges
  and corpus growth without re-encoding.

Everything is vectorized numpy — this code runs inside Arrow UDFs on
executors; per-element Python loops are bounded by the max varbyte *width*
(10), never by the number of postings.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"LP"
VERSION = 1
BLOCK_SIZE = 128

_HEADER = struct.Struct("<2sBIHI")  # magic, version, count, block_size, n_blocks
# per-block skip entry: last_docid u64, doc_off u32, tf_off u32, dl_off u32,
# max_tf u32, min_dl u32  (offsets are relative to each stream's start)
_SKIP_DTYPE = np.dtype(
    [
        ("last_docid", "<u8"),
        ("doc_off", "<u4"),
        ("tf_off", "<u4"),
        ("dl_off", "<u4"),
        ("max_tf", "<u4"),
        ("min_dl", "<u4"),
    ]
)


def vb_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varbyte-encode uint64 values; returns (buffer, per-value byte widths)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, np.int64)
    widths = np.ones(n, np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        widths += tmp > 0
        tmp >>= np.uint64(7)
    out = np.zeros(int(widths.sum()), np.uint8)
    starts = np.zeros(n, np.int64)
    np.cumsum(widths[:-1], out=starts[1:])
    cur = v.copy()
    idx = starts.copy()
    remaining = widths.copy()
    for _ in range(int(widths.max())):
        mask = remaining > 0
        b = (cur[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (remaining[mask] > 1).astype(np.uint8) << 7
        out[idx[mask]] = b | cont
        cur[mask] >>= np.uint64(7)
        idx[mask] += 1
        remaining[mask] -= 1
    return out.tobytes(), widths


def vb_decode(buf: np.ndarray | bytes, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream to uint64 (vectorized).

    Width-based assembly: after locating value boundaries, each extra byte
    position is OR-shifted in with one value-level masked gather per width
    step (bounded by the max byte width, <= 10). This replaces the previous
    byte-level arange+cumsum+reduceat pipeline — 3x fewer elements per pass
    and ~2-3x measured wall on posting-sized streams, which is the dominant
    cost of cold posting reads (wand serving) and merge decodes."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, np.uint64)
    is_last = b < 128
    ends = np.flatnonzero(is_last)
    n = len(ends)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    vals = (b[starts] & 0x7F).astype(np.uint64)
    maxw = int(widths.max()) if n else 1
    for w in range(1, maxw):
        m = widths > w
        vals[m] |= (b[starts[m] + w] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(
            7 * w
        )
    if count is not None:
        assert n == count, f"decoded {n} != expected {count}"
    return vals


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> bytes:
    """Encode one term-chunk posting list (docids strictly increasing)."""
    n = len(docids)
    docids = np.ascontiguousarray(docids, np.uint64)
    tfs = np.ascontiguousarray(tfs, np.uint64)
    dls = np.ascontiguousarray(dls, np.uint64)
    if n:
        deltas = np.empty(n, np.uint64)
        deltas[0] = docids[0]
        deltas[1:] = docids[1:] - docids[:-1]
        if n > 1 and (docids[1:] <= docids[:-1]).any():
            raise ValueError("docids must be strictly increasing")
    else:
        deltas = docids

    doc_buf, doc_w = vb_encode(deltas)
    tf_buf, tf_w = vb_encode(tfs)
    dl_buf, dl_w = vb_encode(dls)

    n_blocks = (n + block_size - 1) // block_size if n else 0
    skips = np.zeros(n_blocks, dtype=_SKIP_DTYPE)
    if n:
        doc_cum = np.concatenate(([0], np.cumsum(doc_w)))
        tf_cum = np.concatenate(([0], np.cumsum(tf_w)))
        dl_cum = np.concatenate(([0], np.cumsum(dl_w)))
        for i in range(n_blocks):
            lo, hi = i * block_size, min((i + 1) * block_size, n)
            skips[i]["last_docid"] = docids[hi - 1]
            skips[i]["doc_off"] = doc_cum[lo]
            skips[i]["tf_off"] = tf_cum[lo]
            skips[i]["dl_off"] = dl_cum[lo]
            skips[i]["max_tf"] = tfs[lo:hi].max()
            skips[i]["min_dl"] = dls[lo:hi].min()

    header = _HEADER.pack(MAGIC, VERSION, n, block_size, n_blocks)
    return header + skips.tobytes() + doc_buf + tf_buf + dl_buf


def encode_many(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[bytes]:
    """Encode MANY posting groups in one vectorized pass.

    ``starts`` marks group start indices into the (group-contiguous,
    docid-sorted-within-group) arrays. The varbyte streams for all groups are
    produced by three whole-array ``vb_encode`` calls; headers, skip tables
    and the final payload assembly are likewise whole-array passes (one
    output buffer, vectorized run copies) — the only per-group Python work
    is slicing the finished buffer into the returned ``bytes`` objects.
    A build's reduce task holds ~10^5 groups; the previous per-group loop
    (np.zeros + reduceat + struct.pack + bytes concat per group) was the
    single largest CPU cost of the whole build stage (profiled 3.4 s of a
    7.2 s map-encode leg at 250k turns).
    """
    n = len(docids)
    if n == 0:
        return []
    docids = np.ascontiguousarray(docids, np.uint64)
    tfs = np.ascontiguousarray(tfs, np.uint64)
    dls = np.ascontiguousarray(dls, np.uint64)
    starts = np.ascontiguousarray(starts, np.int64)
    ends = np.concatenate([starts[1:], [n]])
    ng = len(starts)

    deltas = docids.copy()
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[starts] = docids[starts]
    if n > 1:
        interior = np.ones(n, bool)
        interior[starts] = False
        if (docids[1:][interior[1:]] <= docids[:-1][interior[1:]]).any():
            raise ValueError("docids must be strictly increasing within groups")

    doc_buf, doc_w = vb_encode(deltas)
    tf_buf, tf_w = vb_encode(tfs)
    dl_buf, dl_w = vb_encode(dls)
    doc_cum = np.zeros(n + 1, np.int64)
    tf_cum = np.zeros(n + 1, np.int64)
    dl_cum = np.zeros(n + 1, np.int64)
    np.cumsum(doc_w, out=doc_cum[1:])
    np.cumsum(tf_w, out=tf_cum[1:])
    np.cumsum(dl_w, out=dl_cum[1:])

    hs, ss = _HEADER.size, _SKIP_DTYPE.itemsize
    cnts = ends - starts
    nb = (cnts + block_size - 1) // block_size
    total_blocks = int(nb.sum())
    nb_cum = np.zeros(ng + 1, np.int64)
    np.cumsum(nb, out=nb_cum[1:])
    bg = np.repeat(np.arange(ng, dtype=np.int64), nb)  # group of each block
    within = np.arange(total_blocks, dtype=np.int64) - nb_cum[bg]
    bstarts = starts[bg] + within * block_size
    bends = np.minimum(bstarts + block_size, ends[bg])
    skips = np.zeros(total_blocks, dtype=_SKIP_DTYPE)
    if total_blocks:
        skips["last_docid"] = docids[bends - 1]
        skips["doc_off"] = doc_cum[bstarts] - doc_cum[starts[bg]]
        skips["tf_off"] = tf_cum[bstarts] - tf_cum[starts[bg]]
        skips["dl_off"] = dl_cum[bstarts] - dl_cum[starts[bg]]
        # block starts ascend globally and partition [starts[0], n), so one
        # whole-array reduceat covers every block of every group
        skips["max_tf"] = np.maximum.reduceat(tfs, bstarts)
        skips["min_dl"] = np.minimum.reduceat(dls, bstarts)

    # headers, little-endian <2sBIHI, built column-wise
    hdr = np.empty((ng, hs), np.uint8)
    hdr[:, 0], hdr[:, 1], hdr[:, 2] = MAGIC[0], MAGIC[1], VERSION
    cu = cnts.astype(np.uint64)
    for j in range(4):
        hdr[:, 3 + j] = (cu >> np.uint64(8 * j)) & np.uint64(0xFF)
    hdr[:, 7] = block_size & 0xFF
    hdr[:, 8] = (block_size >> 8) & 0xFF
    nbu = nb.astype(np.uint64)
    for j in range(4):
        hdr[:, 9 + j] = (nbu >> np.uint64(8 * j)) & np.uint64(0xFF)

    doc_len = doc_cum[ends] - doc_cum[starts]
    tf_len = tf_cum[ends] - tf_cum[starts]
    dl_len = dl_cum[ends] - dl_cum[starts]
    skip_len = nb * ss
    out_len = hs + skip_len + doc_len + tf_len + dl_len
    out_off = np.zeros(ng + 1, np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint8)

    out[(out_off[:-1, None] + np.arange(hs)).ravel()] = hdr.ravel()
    if total_blocks:
        srows = np.frombuffer(skips.tobytes(), np.uint8).reshape(total_blocks, ss)
        sidx = ((out_off[bg] + hs + within * ss)[:, None] + np.arange(ss)).ravel()
        out[sidx] = srows.ravel()

    def _copy_runs(dst_off: np.ndarray, src: np.ndarray, src_off: np.ndarray,
                   lens: np.ndarray) -> None:
        tot = int(lens.sum())
        if tot == 0:
            return
        l_cum = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=l_cum[1:])
        w = np.arange(tot, dtype=np.int64) - np.repeat(l_cum[:-1], lens)
        out[np.repeat(dst_off, lens) + w] = src[np.repeat(src_off, lens) + w]

    doc_dst = out_off[:-1] + hs + skip_len
    tf_dst = doc_dst + doc_len
    dl_dst = tf_dst + tf_len
    _copy_runs(doc_dst, np.frombuffer(doc_buf, np.uint8), doc_cum[starts], doc_len)
    _copy_runs(tf_dst, np.frombuffer(tf_buf, np.uint8), tf_cum[starts], tf_len)
    _copy_runs(dl_dst, np.frombuffer(dl_buf, np.uint8), dl_cum[starts], dl_len)

    ob = out.tobytes()
    offs = out_off.tolist()
    return [ob[offs[g]: offs[g + 1]] for g in range(ng)]


class PostingReader:
    """Zero-copy-ish view over an encoded posting payload."""

    def __init__(self, buf: bytes):
        magic, version, self.count, self.block_size, self.n_blocks = _HEADER.unpack_from(buf, 0)
        assert magic == MAGIC and version == VERSION, "bad posting payload"
        off = _HEADER.size
        self.skips = np.frombuffer(buf, dtype=_SKIP_DTYPE, count=self.n_blocks, offset=off)
        self._raw = np.frombuffer(buf, dtype=np.uint8)
        streams_start = off + self.n_blocks * _SKIP_DTYPE.itemsize
        # stream boundaries: doc stream ends where block0-relative offsets say;
        # we recover lengths by decoding counts — store explicit ends instead:
        # doc stream length = total bytes of doc stream = (next stream start).
        # They were concatenated in order; recompute by decoding widths is
        # wasteful, so we locate ends via the last value's bytes: simplest is
        # to scan from the end of each stream; instead keep it simple and
        # decode sequentially below.
        self._streams_start = streams_start

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the full (docids, tfs, dls)."""
        if self.count == 0:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), z.copy()
        body = self._raw[self._streams_start:]
        # streams are back-to-back varbyte runs of exactly `count` values each
        is_last = body < 128
        ends = np.flatnonzero(is_last)
        doc_end = ends[self.count - 1] + 1
        tf_end = ends[2 * self.count - 1] + 1
        dl_end = ends[3 * self.count - 1] + 1
        deltas = vb_decode(body[:doc_end], self.count)
        tfs = vb_decode(body[doc_end:tf_end], self.count)
        dls = vb_decode(body[tf_end:dl_end], self.count)
        docids = np.cumsum(deltas.astype(np.uint64))
        return docids, tfs, dls

    def block_bounds(self, i: int) -> tuple[int, int]:
        lo = i * self.block_size
        hi = min((i + 1) * self.block_size, self.count)
        return lo, hi


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return PostingReader(buf).decode_all()


def decode_postings_many(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting payloads in one set of vectorized passes.

    ``data`` is a uint8 buffer holding the payloads (e.g. an Arrow binary
    column's value buffer, zero-copy); payload i occupies
    ``data[starts[i]:ends[i]]``. Returns (docids int64, tfs float64,
    dls float64) concatenated in payload order — value-identical to
    concatenating per-payload ``decode_postings`` results (asserted in
    tests), but the varbyte width loop, flatnonzero and cumsum each run
    ONCE over the whole batch instead of once per ~50 KB payload. This is
    the cold-query serving path: a head term's posting list spans hundreds
    of chunk payloads and the per-call fixed costs dominated the decode
    (profiled: 774 decode_postings calls = 0.77 s of a 1.05 s cold query).
    """
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    if len(starts) == 0:
        z = np.zeros(0, np.int64)
        return z, np.zeros(0, np.float64), np.zeros(0, np.float64)
    # headers: count u32 at +3, n_blocks u32 at +9 (little-endian) —
    # gathered byte-by-byte (4 gathers of n_payloads elements), never a
    # whole-buffer dtype conversion
    def _u32(off: np.ndarray) -> np.ndarray:
        return (
            data[off].astype(np.int64)
            | (data[off + 1].astype(np.int64) << 8)
            | (data[off + 2].astype(np.int64) << 16)
            | (data[off + 3].astype(np.int64) << 24)
        )

    counts = _u32(starts + 3)
    n_blocks = _u32(starts + 9)
    body_starts = starts + _HEADER.size + n_blocks * _SKIP_DTYPE.itemsize
    nz = counts > 0
    if not nz.all():
        counts, body_starts, ends = counts[nz], body_starts[nz], ends[nz]
    if len(counts) == 0:
        z = np.zeros(0, np.int64)
        return z, np.zeros(0, np.float64), np.zeros(0, np.float64)
    # Blocked decode: payloads are grouped into ~1 MB body batches. One
    # monolithic pass over a multi-MB head-term body streams every width
    # pass through DRAM; ~1 MB groups keep the working set cache-resident
    # (measured 210 ms monolithic vs 121 ms per-payload vs ~85 ms blocked
    # on a 1.9M-posting term) while the per-group fixed cost stays ~20
    # python iterations per term instead of ~800.
    sizes = ends - body_starts
    group_of = (np.cumsum(sizes) - sizes) >> 20
    cuts = np.flatnonzero(np.diff(group_of)) + 1
    out_d, out_tf, out_dl = [], [], []
    for lo, hi in zip(
        np.concatenate(([0], cuts)), np.concatenate((cuts, [len(counts)]))
    ):
        body = np.concatenate(
            [data[a:b] for a, b in zip(body_starts[lo:hi], ends[lo:hi])]
        )
        d, tf, dl = _decode_concat_bodies(body, counts[lo:hi])
        out_d.append(d)
        out_tf.append(tf)
        out_dl.append(dl)
    if len(out_d) == 1:
        return out_d[0], out_tf[0], out_dl[0]
    return (
        np.concatenate(out_d),
        np.concatenate(out_tf),
        np.concatenate(out_dl),
    )


def _decode_concat_bodies(
    body: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of back-to-back posting BODIES (streams only,
    headers stripped); payload i contributes 3*counts[i] varbyte values."""
    # every varbyte stream ends on a terminator byte (<128), so value
    # boundaries never straddle payload joins in the concatenation
    ends_v = np.flatnonzero(body < 128)
    n_vals = len(ends_v)
    assert n_vals == int(3 * counts.sum()), "corrupt posting batch"
    starts_v = np.empty_like(ends_v)
    starts_v[0] = 0
    starts_v[1:] = ends_v[:-1] + 1
    widths = ends_v - starts_v + 1
    vals = (body[starts_v] & 0x7F).astype(np.uint64)
    for w in range(1, int(widths.max())):
        m = widths > w
        vals[m] |= (body[starts_v[m] + w] & np.uint8(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * w)
    # per payload the values run [doc deltas | tfs | dls], counts[i] each
    npay = len(counts)
    coff = np.zeros(npay + 1, np.int64)
    np.cumsum(counts, out=coff[1:])
    n_tot = int(coff[-1])
    voff = coff[:-1] * 3  # value offset of payload i's doc-delta run
    pay_id = np.repeat(np.arange(npay, dtype=np.int64), counts)
    pos = np.arange(n_tot, dtype=np.int64) - np.repeat(coff[:-1], counts)
    doc_idx = voff[pay_id] + pos
    tf_idx = doc_idx + counts[pay_id]
    dl_idx = tf_idx + counts[pay_id]
    deltas = vals[doc_idx]
    tfs = vals[tf_idx].astype(np.float64)
    dls = vals[dl_idx].astype(np.float64)
    # segmented cumsum: deltas[first-of-payload] is the absolute docid
    tot = np.cumsum(deltas)
    first = coff[:-1]
    base = tot[first] - deltas[first]
    docids = (tot - np.repeat(base, counts)).astype(np.int64)
    return docids, tfs, dls


def read_payload_meta(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Parse ONLY the header + skip table of many payloads — zero stream
    decode. Returns (counts int64[n], per-payload skip arrays of
    _SKIP_DTYPE). The serving cold path (wand.search_chunkmax) uses this to
    get df (sum of counts) and chunk-level block-max upper bounds from
    (max_tf, min_dl) without paying the varbyte decode for posting lists
    that can never reach the top-k."""
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    n = len(starts)
    if n == 0:
        return np.zeros(0, np.int64), []
    hs = _HEADER.size  # <2sBIHI: magic 0:2, version 2, count 3:7 (u32 LE),
    ss = _SKIP_DTYPE.itemsize  # block_size 7:9, n_blocks 9:13
    b = np.ascontiguousarray(data)

    def _u32(off: int) -> np.ndarray:  # vectorized LE u32 gather
        return (
            b[starts + off].astype(np.int64)
            | (b[starts + off + 1].astype(np.int64) << 8)
            | (b[starts + off + 2].astype(np.int64) << 16)
            | (b[starts + off + 3].astype(np.int64) << 24)
        )

    # length check BEFORE any header gather: a truncated terminal payload
    # shorter than the header would otherwise index past the buffer
    if ((ends - starts) < hs).any():
        raise ValueError("truncated posting payload header")
    ok = (
        (b[starts] == MAGIC[0])
        & (b[starts + 1] == MAGIC[1])
        & (b[starts + 2] == VERSION)
    )
    if not ok.all():
        raise ValueError("bad posting payload header")
    counts = _u32(3)
    nbs = _u32(9)
    if ((ends - starts) < hs + nbs * ss).any():
        raise ValueError("truncated skip table")
    # zero-copy unaligned structured views into the shared value buffer
    skips = [
        np.ndarray(
            (int(nb),), _SKIP_DTYPE, buffer=b.data, offset=int(s) + hs,
            strides=(ss,),
        )
        for s, nb in zip(starts, nbs)
    ]
    return counts, skips
