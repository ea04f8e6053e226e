#!/usr/bin/env python3
"""Determinism double-run comparator: row-for-row EXCEPT ALL both
directions (multiset equality) for every query output parquet present
in two Verify output dirs. Usage: compare_runs.py dirA dirB
"""
import sys, os, duckdb

a, b = sys.argv[1], sys.argv[2]
def outs(d):
    return {n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n)) and not n.startswith("_")}

sa, sb = outs(a), outs(b)
names = sorted(sa & sb)
only_a, only_b = sorted(sa - sb), sorted(sb - sa)
if only_a or only_b:
    print(f"MANIFEST MISMATCH only_a={only_a} only_b={only_b}")
    sys.exit(1)

con = duckdb.connect()
bad = 0
for n in names:
    pa = os.path.join(a, n)
    pb = os.path.join(b, n)
    try:
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}/*.parquet') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pb}/*.parquet'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}/*.parquet') "
            f"EXCEPT ALL SELECT * FROM read_parquet('{pa}/*.parquet'))").fetchone()[0]
    except Exception as e:
        print(f"{n}: ERROR {e}")
        bad += 1
        continue
    if d1 or d2:
        print(f"{n}: DIFF a-b={d1} b-a={d2}")
        bad += 1
print(f"{len(names)} compared, {bad} differ")
sys.exit(1 if bad else 0)
