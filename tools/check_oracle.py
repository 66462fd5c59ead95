#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark result) and runs
<verify_out_dir>/oracle_sql.json's SQL in DuckDB over <sf_dir>/*.parquet,
then compares: schema (column names sorted), row count, and exact values
after sorting columns by name and rows by all columns. Exact equality —
the driver hashes values, so a 1-ulp float diff is a FAIL here too.

Driver-side python only (duckdb/pyarrow); never a library dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def cmp_values(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        spark_df = con.sql(
            f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs "
                  f"{list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = cmp_values(x, y)
                if not ok and x is not None and y is not None:
                    try:  # timestamps/dates compare via str
                        ok = str(x) == str(y)
                    except Exception:
                        pass
                if not ok and (x is None) != (y is None):
                    ok = False
                if not ok:
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"[FAIL] {name}: col {c} row {i}: spark={x!r} "
                  f"duck={y!r}")
            failures += 1
        else:
            print(f"[OK] {name}: {len(a)} rows, {len(a.columns)} cols")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
