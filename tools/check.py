#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads a Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares:
row count, schema (column name -> type after name-sort), and exact values
(rows sorted, columns sorted by name). Run:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: {a!r} != {b!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    import os
    rows_only = sorted(set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"})
    for name in rows_only:
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only check, {n} rows")
            failures += 0 if n > 0 else 1
        except Exception as e:
            print(f"FAIL {name}: unreadable: {e}")
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
