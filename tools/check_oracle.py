#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only;
the shipped engine is pure Scala/Spark). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Loads each <name>/ parquet produced by graft.Verify, runs the matching
oracle_sql.json entry in DuckDB against the sf tables, sorts columns by
name and rows by all columns, and diffs values."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracles):
    qdir = f"{out_dir}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracles[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if got.dtypes.tolist() != want.dtypes.tolist():
        print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {want.dtypes.tolist()}")
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    eq = got.equals(want)
    if not eq:
        diff = (got != want) & ~(got.isna() & want.isna())
        ndiff = int(diff.values.sum())
        print(f"FAIL {name}: {ndiff} differing cells")
        bad = diff.any(axis=1)
        print(pd.concat([got[bad].head(3).add_suffix('_got'),
                         want[bad].head(3).add_suffix('_want')], axis=1))
        fails += 1; continue
    print(f"PASS {name} ({len(got)} rows)")
print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
