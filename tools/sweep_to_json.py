#!/usr/bin/env python3
"""Convert a determinism_sweep.py run into a committed JSON artifact.

Usage: sweep_to_json.py DIR_A DIR_B OUT.json CPUS_A CPUS_B

Runs the same cell-for-cell compare rule as determinism_sweep.py —
columns sorted by name, rows sorted, exact cell equality — and writes
{meta, per-query flags, counts} as JSON. NOTE: the rule is DUPLICATED
here (this script compares via DuckDB EXCEPT, the sweep via pandas);
if determinism_sweep.py's compare ever changes, keep this one in
sync or the committed artifacts silently diverge from the sweep.
Exit 0 iff all queries are bit-identical across the two parallelism
settings.
"""
import sys, os, json
import duckdb

def main():
    a, b, out, cpus_a, cpus_b = sys.argv[1:6]
    def dirs(root):
        return {d for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))}
    names = sorted(dirs(a) | dirs(b))
    con = duckdb.connect()
    queries, bad = {}, 0
    for n in names:
        if not (os.path.isdir(os.path.join(a, n))
                and os.path.isdir(os.path.join(b, n))):
            queries[n] = {"identical": False, "note": "absent in one run"}
            bad += 1
            continue
        try:
            ra = con.execute(f"SELECT * FROM '{a}/{n}/*.parquet'").fetchdf()
            rb = con.execute(f"SELECT * FROM '{b}/{n}/*.parquet'").fetchdf()
            cols = sorted(ra.columns)
            ra = ra[cols].sort_values(cols).reset_index(drop=True)
            rb = rb[cols].sort_values(cols).reset_index(drop=True)
            ok = bool(ra.equals(rb))
            queries[n] = {"identical": ok, "rows": len(ra)}
            if not ok:
                queries[n]["rows_b"] = len(rb)
                bad += 1
        except Exception as e:
            queries[n] = {"identical": False, "note": str(e)[:200]}
            bad += 1
    doc = {
        "compare": "columns sorted by name, rows sorted, exact cell equality",
        "cpus": [int(cpus_a), int(cpus_b)],
        "n_queries": len(names),
        "n_identical": len(names) - bad,
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{len(names) - bad}/{len(names)} partition-independent -> {out}")
    sys.exit(1 if bad else 0)

main()
