#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sort columns by name, and compare cell-by-cell (exact for non-floats, exact
bits for floats first, then tolerance report).
"""
import sys, json, glob, os
import duckdb
import math

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{q}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {q}: no spark output dir"); fails += 1; continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: {e}"); fails += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {q}: columns differ spark={sc} duck={dc}"); fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {q}: rows spark={len(spark_df)} duck={len(duck_df)}"); fails += 1; continue
    spark_df, duck_df = spark_df[sc], duck_df[sc]
    bad = []
    for c in sc:
        a, b = spark_df[c].tolist(), duck_df[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None: continue
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    bad.append((c, i, x, y))
            elif str(x) != str(y):
                bad.append((c, i, x, y))
            if len(bad) > 3: break
        if len(bad) > 3: break
    if bad:
        print(f"FAIL {q}: value diffs (col,row,spark,duck): {bad[:4]}"); fails += 1
    else:
        print(f"OK   {q}: {len(spark_df)} rows")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
