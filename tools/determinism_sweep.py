#!/usr/bin/env python3
"""Compare two graft.Verify output dirs cell-for-cell.

Usage: determinism_sweep.py DIR_A DIR_B

The two dirs should come from Verify runs with DIFFERENT parallelism
(e.g. SPARK_GRAFT_CPUS=4 vs 13): any query whose result depends on
partition count or merge order (float accumulation, unstable sort,
non-deterministic sampling) shows up as a DIFF. Exit 0 iff all match.
"""
import sys, os
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    # union of BOTH listings: a query that produced output in only one
    # run (the other crashed or skipped it) must surface as MISS, not
    # silently shrink the compared set
    def dirs(root):
        return {d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))}
    names = sorted(dirs(a) | dirs(b))
    con = duckdb.connect()
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(a, n)):
            print(f"MISS {n}: absent in {a}"); bad += 1; continue
        if not os.path.isdir(os.path.join(b, n)):
            print(f"MISS {n}: absent in {b}"); bad += 1; continue
        try:
            ra = con.execute(
                f"SELECT * FROM '{a}/{n}/*.parquet'").fetchdf()
            rb = con.execute(
                f"SELECT * FROM '{b}/{n}/*.parquet'").fetchdf()
            cols = sorted(ra.columns)
            ra = ra[cols].sort_values(cols).reset_index(drop=True)
            rb = rb[cols].sort_values(cols).reset_index(drop=True)
            if ra.equals(rb):
                print(f"OK   {n}: {len(ra)} rows")
            else:
                print(f"DIFF {n}: {len(ra)} vs {len(rb)} rows"); bad += 1
        except Exception as e:
            print(f"ERR  {n}: {e}"); bad += 1
    print(f"\n{len(names) - bad}/{len(names)} queries partition-independent")
    sys.exit(1 if bad else 0)

main()
