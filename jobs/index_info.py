"""Index inspector (Luke-style): manifest, segments, sidecars, top terms.

Usage:
  python jobs/index_info.py --index /path/to/index_dir [--top 10]

Reads only driver-side metadata (manifest JSON + parquet footers via
DuckDB) — no Spark session, safe to run against a live index.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--top", type=int, default=10, help="top-df dictionary terms")
    args = ap.parse_args()

    from lucene_mapreduce_spark.index.manifest import load_manifest, segment_dir

    m = load_manifest(args.index)
    if m is None:
        print(f"no manifest at {args.index}")
        raise SystemExit(1)
    print(
        f"index {args.index}\n"
        f"  version {m.version}  committed_seq {m.committed_seq}  "
        f"updated {m.updated_at}\n"
        f"  num_partitions {m.num_partitions}  chunk_docs {m.chunk_docs}\n"
        f"  segments {len(m.segments)}  docs(upper) {m.n_docs_upper}"
    )
    for s in m.ordered():
        sidecars = "".join(
            flag
            for flag, on in (
                ("D", s.has_docstore), ("T", s.has_dict), ("P", s.has_positions)
            )
            if on
        )
        print(
            f"  {s.segment_id}: L{s.level} seq[{s.min_seq},{s.max_seq}] "
            f"docs {s.n_docs} tokens {s.total_tokens} terms {s.n_terms} "
            f"postings {s.n_postings} sidecars[{sidecars or '-'}]"
        )
        if s.lineage:
            print(f"    lineage: {s.lineage}")

    # top terms from the dictionary sidecar of the newest segment with one
    newest = [s for s in reversed(m.ordered()) if s.has_dict]
    if newest and args.top > 0:
        import duckdb

        d = os.path.join(segment_dir(args.index, newest[0].segment_id), "dictionary")
        rows = duckdb.sql(
            f"SELECT term, df, cf FROM read_parquet('{d}/*.parquet') "
            f"ORDER BY df DESC, term ASC LIMIT {args.top}"
        ).fetchall()
        print(f"  top-{args.top} terms of {newest[0].segment_id} (df, cf):")
        for t, df, cf in rows:
            print(f"    {t}\t{df}\t{cf}")


if __name__ == "__main__":
    main()
