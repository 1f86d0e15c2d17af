"""Segment manifest: the index's atomic commit + lineage + metrics protocol.

The reference publishes indexes by copying directories and flipping
``DONE_XDI_INDEX_<date>`` status files (ReplaceIndex.java:71-106,
IndexBuilder.java:456-479) and resumes hourly builds from ``e_status.txt``
(IndexBuilder.java:340-349). Here all of that is one JSON manifest written
atomically (tmp + rename) *after* segment data files exist — crash at any
point leaves either the old or the new manifest, never a torn index
(Iceberg-style manifest-last commit).

Recency/upsert model: every committed segment owns a contiguous interval
[min_seq, max_seq] of batch sequence numbers. A doc in segment A is shadowed
(dead) iff some segment with min_seq > A.max_seq also contains it —
latest-wins upsert semantics (reference ``updateDocument``,
IndexBuilderReducer.java:159). Merges only ever combine seq-contiguous
segments, so intervals never interleave and recency stays a total order.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class SegmentMeta:
    segment_id: str
    level: int
    min_seq: int
    max_seq: int
    n_docs: int
    total_tokens: int
    n_terms: int
    n_postings: int
    parents: list[str] = field(default_factory=list)
    # stored-fields sidecar present (the reference's stored `mapinfo` payload,
    # IndexBuilderReducer.java:157-158 — here a doc_id-sorted parquet docstore)
    has_docstore: bool = False
    # term-dictionary sidecar present (Lucene's terms index analogue:
    # term-sorted (term, df, cf) parquet — fuzzy/prefix expansion and df
    # lookups without touching posting payloads)
    has_dict: bool = False
    # positional-postings sidecar present (Lucene's .pos file analogue:
    # per (term, doc) token positions, phash-partitioned like the postings —
    # phrase/proximity verification without stored fields)
    has_positions: bool = False
    # indexed keyword fields (Lucene StringField analogue): names of the
    # corpus columns whose (value -> doc_ids) postings live in the fields
    # sidecar — field clauses resolve from the index, no docstore scan
    indexed_fields: list[str] = field(default_factory=list)
    # per-partition metrics + lineage (north rule: per-partition lineage
    # and metrics written alongside checkpointed segment manifests)
    partitions: list[dict[str, Any]] = field(default_factory=list)
    lineage: dict[str, Any] = field(default_factory=dict)


class ConcurrentCommitError(RuntimeError):
    """Another writer committed between our read and our commit — the
    single-writer contract (reference: lock-service gating + `ps -ef` job
    locks, scripts/build_index.sh:3-7) was violated; retry from a fresh
    manifest read instead of silently losing the other writer's segments."""


@dataclass
class Manifest:
    num_partitions: int
    chunk_docs: int
    segments: list[SegmentMeta] = field(default_factory=list)
    committed_seq: int = 0
    format_version: int = 1
    updated_at: str = ""
    # monotonically increasing commit counter (optimistic concurrency token)
    version: int = 0

    def segment(self, segment_id: str) -> SegmentMeta:
        for s in self.segments:
            if s.segment_id == segment_id:
                return s
        raise KeyError(segment_id)

    def ordered(self) -> list[SegmentMeta]:
        return sorted(self.segments, key=lambda s: s.min_seq)

    @property
    def n_docs_upper(self) -> int:
        """Upper bound on live docs (exact once fully merged)."""
        return sum(s.n_docs for s in self.segments)


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def segment_dir(index_dir: str, segment_id: str) -> str:
    return os.path.join(index_dir, "segments", segment_id)


def load_manifest(index_dir: str) -> Manifest | None:
    p = manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        raw = json.load(f)
    segs = [SegmentMeta(**s) for s in raw.pop("segments")]
    return Manifest(segments=segs, **raw)


def commit_manifest(
    index_dir: str, m: Manifest, expect_version: int | None = None
) -> None:
    """Atomic commit: write tmp, fsync, rename over manifest.json.

    ``expect_version`` enables optimistic concurrency: pass the version of
    the manifest you READ; if a different writer committed in between, the
    commit raises ConcurrentCommitError instead of overwriting (losing)
    their segments. (Rename itself is atomic, so readers never see a torn
    manifest either way.)"""
    if expect_version is not None:
        cur = load_manifest(index_dir)
        cur_version = cur.version if cur is not None else 0
        if cur_version != expect_version:
            raise ConcurrentCommitError(
                f"manifest at {index_dir} moved from version {expect_version} "
                f"to {cur_version} during this job; reload and retry"
            )
        m.version = cur_version + 1
    else:
        m.version += 1
    m.updated_at = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    os.makedirs(index_dir, exist_ok=True)
    payload = asdict(m)
    tmp = manifest_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, manifest_path(index_dir))
