"""Arrow/pandas kernels shared by the segment build and merge pipelines.

Pipeline shape (the index build as map-side-combine MapReduce, re-expressed):

  stage 1 (map, _make_partial_encoder): tokenize + per-doc tf + LOCAL posting
      -list encode per (term, chunk) within each input split. The shuffle then
      carries compressed posting payloads (~2-4 bytes/posting) instead of
      (doc, term, tf, dl) rows (~40 bytes/posting) — a 10-20x reduction in
      shuffle volume, the same trick as the reference's pre-shuffle dedup
      (ParserHandler.java:126-130) taken to its conclusion.

  stage 2 (reduce, _merge_stream): per (term, chunk), decode all partial
      payloads (and, during segment merges, drop shadowed docids), merge-sort
      by docid, re-encode. Streamed over sorted partitions with carry-over —
      no per-group pandas frames; all heavy loops are numpy.

Both stages are bounded by chunk_docs regardless of term skew (head terms
split across chunks), and the shuffle key (phash, chunk) spreads a head
term's chunks over tasks while partitionBy(phash) keeps the persisted
directory contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_mapreduce_spark.index.codec import decode_postings_many, encode_many

POSTING_SCHEMA = (
    "phash int, term string, chunk long, df_chunk int, cf_chunk long, "
    "max_tf int, min_dl int, payload binary"
)

# Partials carry the same stat columns as finished posting rows: the map
# side computes (df, cf, max_tf, min_dl) with the reduceats it already runs
# for encoding, and the reduce kernel's pass-through fast path then copies
# SINGLE-partial groups verbatim — zero decode/re-encode. Map tasks cover
# contiguous docid spans, so most (term, chunk) groups have exactly one
# partial and the build's reduce stage becomes mostly a placement pass
# (guide §2.3/§2.4: the re-encode added no information — the single payload
# was already byte-identical to its re-encoding).
PARTIAL_SCHEMA = (
    "phash int, term string, chunk long, df_chunk int, cf_chunk long, "
    "max_tf int, min_dl int, payload binary"
)

# Reserved pseudo-term that carries per-doc lengths INSIDE the postings
# parquet (entries are (doc_id, tf=dl, dl=dl), so chunk-level df_chunk /
# cf_chunk sums give n_docs / total_tokens without decoding). Identified by
# phash == num_partitions (a reserved directory real terms can never hash
# to), never by name — a document containing the literal string is harmless.
# This is what lets one Spark job produce postings AND doclens AND stats:
# the reference pays a second pass for document norms; we don't.
DL_TERM = "\x00dl"

DOCLEN_SCHEMA = "doc_id long, dl long"


def _decode_doclens(batches):
    """mapInPandas kernel: pseudo-term posting rows -> (doc_id, dl) rows
    (one batched decode per pandas batch, same shape as segments._decode_rows)."""
    for pdf in batches:
        if not len(pdf):
            continue
        bufs = pdf["payload"].to_numpy().tolist()
        sizes = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
        ends = np.cumsum(sizes)
        data = np.frombuffer(b"".join(bufs), np.uint8)
        docids, _tfs, dls = decode_postings_many(data, ends - sizes, ends)
        if len(docids):
            yield pd.DataFrame({"doc_id": docids, "dl": dls.astype("int64")})


def _make_partial_encoder(num_partitions: int, chunk_docs: int):
    """mapInArrow kernel factory: (doc_id, text) -> locally-encoded partial
    posting rows (phash, term, chunk, payload), PLUS per-doc-length rows
    under the reserved DL_TERM pseudo-term (phash = num_partitions) — one
    corpus pass feeds postings, doclens, and segment stats."""

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from lucene_mapreduce_spark.functions.hashing import term_phash

        # Tokenize + per-(doc, term) tf entirely in Arrow C++ / numpy — no
        # per-document Python loop (measured 1.7x on the end-to-end kernel
        # core vs the regex+Counter loop it replaces, BENCH.md round 4):
        # split_pattern_regex -> flatten -> dictionary_encode gives token
        # codes; tf collapse is one hash value_counts over a combined
        # (doc-index, code) int64 key. Token equality with the other three
        # tokenizer implementations is pinned by test_tokenize (RE2's
        # explicit ASCII class, tokenize.py).
        flat_parts: list = []  # token strings per batch (Arrow arrays)
        gidx_parts: list[np.ndarray] = []  # task-local doc index per token
        doc_id_parts, doc_dl_parts = [], []  # per-doc lengths, incl. dl=0 docs
        n_docs_seen = 0
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if not len(ids):
                continue
            # ascii_split_whitespace splits on exactly the tokenizer's pinned
            # 6-char ASCII class (" \t\n\v\f\r"; UTF-8 continuation bytes are
            # >= 0x80 so non-ASCII text can never match) and measured 6.2x
            # faster than the RE2 split_pattern_regex it replaces — empties
            # from leading/trailing runs drop in the existing filter, so the
            # token stream is bit-identical (pinned by test_tokenize's
            # kernel-splitter parity case)
            toks = pc.ascii_split_whitespace(batch.column(1))
            flat = pc.list_flatten(toks)
            parent = pc.list_parent_indices(toks)
            mask = pc.not_equal(flat, "")
            flat = pc.filter(flat, mask)
            parent_np = pc.filter(parent, mask).to_numpy().astype(np.int64)
            per_doc_dl = np.bincount(parent_np, minlength=len(ids)).astype(
                np.int64
            )
            if len(parent_np):
                flat_parts.append(flat)
                gidx_parts.append(parent_np + n_docs_seen)
            doc_id_parts.append(np.asarray(ids, dtype=np.int64))
            doc_dl_parts.append(per_doc_dl)
            n_docs_seen += len(ids)

        if doc_id_parts:
            # doclen pseudo rows: entries (doc_id, tf=dl, dl=dl) per chunk
            pid = np.concatenate(doc_id_parts)
            pdl = np.concatenate(doc_dl_parts)
            pchunk = pid // chunk_docs
            porder = np.lexsort((pid, pchunk))
            pid, pdl, pchunk = pid[porder], pdl[porder], pchunk[porder]
            pn = len(pid)
            pchange = np.empty(pn, bool)
            pchange[0] = True
            pchange[1:] = pchunk[1:] != pchunk[:-1]
            pstarts = np.flatnonzero(pchange)
            ppayloads = encode_many(
                pid.astype(np.uint64), pdl.astype(np.uint64),
                pdl.astype(np.uint64), pstarts,
            )
            ng = len(pstarts)
            pends = np.concatenate([pstarts[1:], [pn]])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.full(ng, num_partitions, np.int32), type=pa.int32()),
                    pa.array([DL_TERM] * ng, type=pa.string()),
                    pa.array(pchunk[pstarts], type=pa.int64()),
                    pa.array((pends - pstarts).astype(np.int32), type=pa.int32()),
                    pa.array(np.add.reduceat(pdl, pstarts).astype(np.int64),
                             type=pa.int64()),
                    pa.array(np.maximum.reduceat(pdl, pstarts).astype(np.int32),
                             type=pa.int32()),
                    pa.array(np.minimum.reduceat(pdl, pstarts).astype(np.int32),
                             type=pa.int32()),
                    pa.array(ppayloads, type=pa.binary()),
                ],
                names=["phash", "term", "chunk", "df_chunk", "cf_chunk",
                       "max_tf", "min_dl", "payload"],
            )

        if not flat_parts:
            return
        dic = pc.dictionary_encode(
            pa.chunked_array(flat_parts).combine_chunks()
        )
        codes_tok = dic.indices.to_numpy().astype(np.int64)
        uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
        nvocab = len(uniq)
        gidx = np.concatenate(gidx_parts)
        # one hash pass counts tf per (doc, term); doc index and vocab code
        # both fit 32 bits, so the combined key is collision-free in int64
        vc = pc.value_counts(pa.array(gidx * nvocab + codes_tok))
        key = vc.field("values").to_numpy()
        tf = vc.field("counts").to_numpy().astype(np.int64)
        pair_gidx = key // nvocab
        codes = key % nvocab
        dl_by_gidx = np.concatenate(doc_dl_parts)
        id_by_gidx = np.concatenate(doc_id_parts)
        d = id_by_gidx[pair_gidx]
        dl = dl_by_gidx[pair_gidx]
        chunk = d // chunk_docs
        order = np.lexsort((d, chunk, codes))
        d, tf, dl = d[order], tf[order], dl[order]
        codes, chunk = codes[order], chunk[order]

        n = len(d)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = (codes[1:] != codes[:-1]) | (chunk[1:] != chunk[:-1])
        starts = np.flatnonzero(change)
        payloads = encode_many(d.astype(np.uint64), tf.astype(np.uint64),
                               dl.astype(np.uint64), starts)
        uniq_arr = np.asarray(uniq, dtype=object)
        phash_by_code = np.fromiter(
            (term_phash(t, num_partitions) for t in uniq_arr), np.int32, len(uniq_arr)
        )
        g_codes = codes[starts]
        g_ends = np.concatenate([starts[1:], [n]])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(phash_by_code[g_codes], type=pa.int32()),
                pa.array(uniq_arr[g_codes], type=pa.string()),
                pa.array(chunk[starts], type=pa.int64()),
                pa.array((g_ends - starts).astype(np.int32), type=pa.int32()),
                pa.array(np.add.reduceat(tf, starts).astype(np.int64),
                         type=pa.int64()),
                pa.array(np.maximum.reduceat(tf, starts).astype(np.int32),
                         type=pa.int32()),
                pa.array(np.minimum.reduceat(dl, starts).astype(np.int32),
                         type=pa.int32()),
                pa.array(payloads, type=pa.binary()),
            ],
            names=["phash", "term", "chunk", "df_chunk", "cf_chunk",
                   "max_tf", "min_dl", "payload"],
        )

    return fn


def _merge_stream(batches):
    """mapInPandas kernel: stream a partition sorted by (term, chunk) where
    each row is one encoded posting block for that group (a map-side partial
    during builds, a segment's block during merges); decode, drop shadowed
    docids, merge-sort by docid, and batch re-encode all groups at once
    (codec.encode_many).

    Dead-doc lists arrive one of two ways:
    - MARKER rows (input carries a `seg_seq` column): term == "" rows hold
      the (seg_seq, chunk) dead list ONCE per phash; they sort before every
      real term of their phash section (empty string < any token, incl.
      DL_TERM's leading NUL) and are consumed into a partition-local map,
      so the shuffle ships each dead list O(num_partitions) times — NOT
      once per posting row. The per-row `dead` join it replaces multiplied
      a chunk's dead list by every (term, chunk) block in the chunk,
      measured as 12.8x merge cost at 4x data (BENCH.md round 3).
    - legacy per-row `dead` column (no seg_seq column): kept for the build
      path, whose rows all carry null.

    Pass-through fast path: a single-row group with no dead list and
    already-known stats (merge inputs carry the segment's stat columns) is
    copied verbatim — no decode, no re-encode. Incremental merges whose
    deltas land in new docid chunks leave the base segment's untouched
    blocks byte-identical and nearly free."""

    dead_map: dict[tuple[int, int], np.ndarray] = {}

    def process(pdf: pd.DataFrame, final: bool):
        term = pdf["term"].to_numpy()
        chunk = pdf["chunk"].to_numpy()
        ph = pdf["phash"].to_numpy()
        n = len(pdf)
        change = np.empty(n, bool)
        change[0] = True
        # group identity includes phash so a real token that happens to spell
        # DL_TERM (different phash) never merges with the pseudo rows
        change[1:] = (
            (term[1:] != term[:-1]) | (chunk[1:] != chunk[:-1]) | (ph[1:] != ph[:-1])
        )
        gstarts = np.flatnonzero(change)
        if not final:
            cut = int(gstarts[-1])
            if cut == 0:
                return None, pdf
            head, tail = pdf.iloc[:cut], pdf.iloc[cut:]
            gstarts = gstarts[:-1]
        else:
            head, tail = pdf, None

        nh = len(head)
        term, chunk, ph = term[:nh], chunk[:nh], ph[:nh]
        payloads = head["payload"].to_numpy()
        seqs = head["seg_seq"].to_numpy() if "seg_seq" in head.columns else None
        deads = (
            head["dead"].to_numpy()
            if seqs is None and "dead" in head.columns
            else None
        )

        # per-row dead lists resolved up front (rare: only rows whose chunk
        # carries a dead list at all are looked up)
        row_dead = np.full(nh, None, dtype=object)
        if seqs is not None and dead_map:
            dchunks = np.fromiter(
                {c for _, c in dead_map}, np.int64,
            )
            for i in np.flatnonzero(np.isin(chunk, dchunks)):
                row_dead[i] = dead_map.get((int(seqs[i]), int(chunk[i])))
        elif deads is not None:
            for i in range(nh):
                d = deads[i]
                if d is not None and len(d):
                    row_dead[i] = np.asarray(d, np.uint64)
        # elementwise object-identity scan, NOT np.not_equal: ndarray
        # entries would broadcast an elementwise comparison against None
        has_dead = np.fromiter((x is not None for x in row_dead), bool, nh)

        ngroups = len(gstarts)
        gends = np.concatenate([gstarts[1:], [nh]])
        gsizes = gends - gstarts

        if "df_chunk" in head.columns:
            dfc = head["df_chunk"].to_numpy()
            cfc = head["cf_chunk"].to_numpy()
            mtf = head["max_tf"].to_numpy()
            mdl = head["min_dl"].to_numpy()
            stats_ok = ~pd.isna(dfc)
        else:
            dfc = None
            stats_ok = np.zeros(nh, bool)

        # pass-through fast path, in bulk: single-payload group, no dead
        # list, known stats — copied verbatim by fancy indexing (no decode,
        # no per-group Python loop)
        passthrough = (gsizes == 1) & ~has_dead[gstarts] & stats_ok[gstarts]

        out_df = np.zeros(ngroups, np.int64)
        out_cf = np.zeros(ngroups, np.int64)
        out_mtf = np.zeros(ngroups, np.int64)
        out_mdl = np.zeros(ngroups, np.int64)
        out_pay = np.full(ngroups, None, dtype=object)
        valid = passthrough.copy()

        # rework groups: ONE batched varbyte decode over every remaining
        # payload, dead masking on the few rows that carry a list, one
        # stable lexsort to (group, docid) order — identical to the
        # per-group stable merge of payloads in row order, because the sort
        # is stable and payload concatenation order equals row order — then
        # reduceat stats and one batched re-encode.
        row_group = np.repeat(np.arange(ngroups, dtype=np.int64), gsizes)
        rw_rows = np.flatnonzero(~passthrough[row_group])
        if len(rw_rows):
            bufs = [payloads[i] for i in rw_rows]
            sizes = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
            p_ends = np.cumsum(sizes)
            p_starts = p_ends - sizes
            data = np.frombuffer(b"".join(bufs), np.uint8)
            counts = (
                data[p_starts + 3].astype(np.int64)
                | (data[p_starts + 4].astype(np.int64) << 8)
                | (data[p_starts + 5].astype(np.int64) << 16)
                | (data[p_starts + 6].astype(np.int64) << 24)
            )
            d, tf, dl = decode_postings_many(data, p_starts, p_ends)
            pgrp = np.repeat(row_group[rw_rows], counts)
            dead_rows = np.flatnonzero(has_dead[rw_rows])
            if len(dead_rows):
                coff = np.zeros(len(counts) + 1, np.int64)
                np.cumsum(counts, out=coff[1:])
                keep = np.ones(len(d), bool)
                for j in dead_rows:
                    lo, hi = int(coff[j]), int(coff[j + 1])
                    keep[lo:hi] = ~np.isin(
                        d[lo:hi].astype(np.uint64), row_dead[rw_rows[j]]
                    )
                if not keep.all():
                    d, tf, dl, pgrp = d[keep], tf[keep], dl[keep], pgrp[keep]
            if len(d):
                order = np.lexsort((d, pgrp))
                d, tf, dl, pgrp = d[order], tf[order], dl[order], pgrp[order]
                pstarts = np.flatnonzero(
                    np.concatenate(([True], pgrp[1:] != pgrp[:-1]))
                )
                pends = np.concatenate((pstarts[1:], [len(d)]))
                gids = pgrp[pstarts]
                out_df[gids] = pends - pstarts
                out_cf[gids] = np.add.reduceat(tf, pstarts).astype(np.int64)
                out_mtf[gids] = np.maximum.reduceat(tf, pstarts).astype(np.int64)
                out_mdl[gids] = np.minimum.reduceat(dl, pstarts).astype(np.int64)
                enc = encode_many(
                    d.astype(np.uint64), tf.astype(np.uint64),
                    dl.astype(np.uint64), pstarts,
                )
                enc_arr = np.empty(len(enc), object)
                enc_arr[:] = enc
                out_pay[gids] = enc_arr
                valid[gids] = True

        if passthrough.any():
            pt = gstarts[passthrough]
            out_df[passthrough] = dfc[pt].astype(np.int64)
            out_cf[passthrough] = cfc[pt].astype(np.int64)
            out_mtf[passthrough] = mtf[pt].astype(np.int64)
            out_mdl[passthrough] = mdl[pt].astype(np.int64)
            out_pay[passthrough] = payloads[pt]

        if not valid.any():
            return None, tail
        vg = np.flatnonzero(valid)
        vrows = gstarts[vg]
        out = pd.DataFrame(
            {
                "phash": ph[vrows].astype("int32"),
                "term": term[vrows],
                "chunk": chunk[vrows].astype("int64"),
                "df_chunk": out_df[vg].astype("int32"),
                "cf_chunk": out_cf[vg],
                "max_tf": out_mtf[vg].astype("int32"),
                "min_dl": out_mdl[vg].astype("int32"),
                "payload": out_pay[vg],
            }
        )
        return out, tail

    carry = None
    for pdf in batches:
        if "seg_seq" in pdf.columns and len(pdf):
            mk = (pdf["term"] == "").to_numpy()
            if mk.any():
                for s, c, dd in zip(
                    pdf["seg_seq"].to_numpy()[mk],
                    pdf["chunk"].to_numpy()[mk],
                    pdf["dead"].to_numpy()[mk],
                ):
                    if dd is not None and len(dd):
                        dead_map[(int(s), int(c))] = np.asarray(dd, np.uint64)
                pdf = pdf[~mk].reset_index(drop=True)
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        out, carry = process(pdf, final=False)
        if out is not None and len(out):
            yield out
    if carry is not None and len(carry):
        out, _ = process(carry, final=True)
        if out is not None and len(out):
            yield out
