#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each <name>/ parquet dir in verify_out_dir and its SQL in
oracle_sql.json: run the SQL in DuckDB over the sf_dir tables, sort
columns by name, sort rows, compare row count / schema-ish / values.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(outdir, sfdir):
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            print(f"  [rows-only] {name}: rows={len(spark_df)} "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!!'}")
            if len(spark_df) == 0:
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, o = norm(spark_df), norm(ora_df)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).splitlines()[:6]
        if ok_rows and ok_cols and ok_vals:
            print(f"  pass {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  FAIL {name}: rows {len(s)} vs {len(o)}, "
                  f"cols {list(s.columns)} vs {list(o.columns)}")
            if ok_rows and ok_cols:
                print("    " + "\n    ".join(err))
    # queries that crashed in Verify never produced a parquet dir and
    # would otherwise be invisible here — surface the manifest as reds
    failed_manifest = os.path.join(outdir, "_failed.json")
    n_crashed = 0
    if os.path.exists(failed_manifest):
        with open(failed_manifest) as f:
            crashed = json.load(f)
        n_crashed = len(crashed)
        for name, err_msg in sorted(crashed.items()):
            print(f"  CRASH {name}: {err_msg[:160]}")
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {n_crashed} CRASHED" if n_crashed else ""))
    return 1 if (n_fail or n_crashed) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
