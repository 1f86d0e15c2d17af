"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and its
DuckDB oracle, compares row count, column names, and order-insensitive
values. Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from lucene_mapreduce_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = all(
                (pd.isna(x) and pd.isna(y)) or (not pd.isna(x) and not pd.isna(y)
                 and math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9))
                for x, y in zip(av, bv)
            )
        else:
            ok = av.astype(str).tolist() == bv.astype(str).tolist()
        if not ok:
            bad = [(i, av.iloc[i], bv.iloc[i]) for i in range(len(av))
                   if str(av.iloc[i]) != str(bv.iloc[i])][:5]
            return False, f"col {c} differs, first: {bad}"
    return True, ""


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, orc = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = orc.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        ok, why = values_match(got, exp)
        print(("ok    " if ok else "FAIL  ") + f"{name}: {len(got)} rows" + ("" if ok else f" — {why}"))
        if not ok:
            failed.append(name)
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
