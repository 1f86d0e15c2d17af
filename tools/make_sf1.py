"""Deterministic sf1 (10x sf0.1) table synthesis for the scale step-up.

The driver ships sf{0.001,0.01,0.1}; this builds an sf1 directory (default
/tmp/sf1) by a deterministic 10x scale-up of sf0.1 so the full oracle gate
and bench can run at 10x the largest shipped input:

- documents:  10 copies; copy k>0 offsets doc_id by k*N and appends k
  'pad' filler tokens to the text (keeps every copy a NEAR-dup of its
  original — realistic for the dedup family — while staying deterministic;
  n_chars recomputed so the stored column stays consistent with text).
  The per-copy distinct padding LENGTH matters: a suffix of constant
  length would give copies 1..9 identical dl and hence exactly-tied BM25
  scores, and cross-engine rank order inside an exact-tie group is decided
  by last-ulp float summation order (Spark sums canonically ascending-term;
  DuckDB's sum() is order-free) — measured as rank flips on the first sf1
  attempt. Distinct dl per copy keeps every synthetic score distinct.
- embeddings: 10 copies, vec_id offset, vectors unchanged (exact-duplicate
  vectors are the realistic degenerate case the LSH/IVF bucket caps exist
  for; copy 0 keeps QUERY_VEC_ID=0)
- events:     10 copies, event_id offset, same users/ts (10x events per
  user; ties stay deterministic via the (ts, event_id) tie-break)
- TPC-H-ish dims (region..lineitem): copied as-is — the ops over them are
  already shuffle-light parity checks, not the scale story

Pure DuckDB (no Spark): both engines then read the same parquet, so every
oracle comparison stays exact. Usage: python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main(out: str = "/tmp/sf1") -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql("SELECT setseed(0.42)")

    n_docs = con.sql(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    con.sql(f"""
COPY (
  SELECT d.doc_id + k.k * {n_docs} AS doc_id,
         CASE WHEN k.k = 0 THEN d.text
              ELSE d.text || repeat(' pad', k.k) END AS text,
         d.lang, d.source,
         CASE WHEN k.k = 0 THEN d.n_chars
              ELSE length(d.text || repeat(' pad', k.k)) END AS n_chars
  FROM '{SRC}/documents.parquet' d
  CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

    n_vecs = con.sql(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.sql(f"""
COPY (
  SELECT e.vec_id + k.k * {n_vecs} AS vec_id, e.embedding, e.label
  FROM '{SRC}/embeddings.parquet' e
  CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

    n_ev = con.sql(f"SELECT count(*) FROM '{SRC}/events.parquet'").fetchone()[0]
    con.sql(f"""
COPY (
  SELECT ev.event_id + k.k * {n_ev} AS event_id, ev.ts, ev.user_id,
         ev.event_type, ev.value, ev.props
  FROM '{SRC}/events.parquet' ev
  CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    for t in ("documents", "embeddings", "events"):
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
