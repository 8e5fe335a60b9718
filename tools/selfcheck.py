#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir] [--json PATH]

1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
   (or run it yourself first);
2. loads each <outDir>/<name> parquet (Spark result);
3. runs <outDir>/oracle_sql.json's SQL in DuckDB over the same parquet
   tables;
4. sorts columns by name, compares shape, dtypes (loosely) and values.

With --strict-types, additionally DESCRIBEs both sides in DuckDB and
compares column types exactly (after a small equivalence map) — this
catches HUGEINT-vs-BIGINT style drift that the driver's type-sensitive
hash flags but loose pandas comparison normalizes away (the round-8
q_logreg_pr lesson).

With --json PATH, also writes a machine-readable per-query artifact:
{"summary": {...}, "queries": {name: {rows_match, cols_match,
cells_match, rows, err}}} — the builder commits this as
SELFCHECK_r{N}.json so the round's correctness signal survives a
driver-side artifact failure (round-6 CORRECTNESS_r06.json was `{}`).

Exit code 0 iff every query matches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return float(v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):  # numpy array
        return tuple(norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
        return norm_cell(v)
    if isinstance(v, bytes):
        return v
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


# DuckDB type spellings considered identical for the strict-type check.
# Keep this list SHORT and justified: every entry is a representation
# the parquet round-trip itself makes unavoidable, not a value drift.
_TYPE_EQUIV = {
    # Spark writes TIMESTAMP_NTZ / int96-free micros; DuckDB spells
    # both plain TIMESTAMP vs TIMESTAMP WITH TIME ZONE depending on
    # the isAdjustedToUTC flag. Values are compared cell-wise anyway.
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
}


def _norm_type(t: str) -> str:
    t = t.strip().upper()
    return _TYPE_EQUIV.get(t, t)


def duck_types(con, describable: str):
    """column -> normalized DuckDB type via DESCRIBE (binds, no exec)."""
    rows = con.execute(f"DESCRIBE {describable}").fetchall()
    return {r[0]: _norm_type(r[1]) for r in rows}


def frame_rows(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = Path(argv[i + 1])
        del argv[i:i + 2]
    strict_types = "--strict-types" in argv
    if strict_types:
        argv.remove("--strict-types")
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_dir = Path(argv[1] if len(argv) > 1 else "/tmp/graft_verify")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; GenSf-scaled dirs are
        # Spark-layout directories of part files — accept both
        p = Path(sf_dir) / f"{t}.parquet"
        pat = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    failures = []
    report = {}
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "cols_match": False,
               "cells_match": False, "rows": None, "err": None}
        report[name] = rec
        spark_dir = out_dir / name
        if not spark_dir.exists():
            rec["err"] = "no spark output"
            failures.append((name, "no spark output"))
            print(f"FAIL {name}: spark output missing")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            rec["err"] = str(e)[:500]
            failures.append((name, f"error: {e}"))
            print(f"FAIL {name}: {e}")
            continue
        g_cols, w_cols = sorted(got.columns), sorted(want.columns)
        if g_cols != w_cols:
            rec["err"] = f"columns {g_cols} != {w_cols}"
            failures.append((name, f"columns {g_cols} != {w_cols}"))
            print(f"FAIL {name}: columns differ\n  spark={g_cols}\n  duck ={w_cols}")
            continue
        rec["cols_match"] = True
        if strict_types:
            try:
                gt = duck_types(
                    con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
                wt = duck_types(con, f"({sql})")
                drift = {c: (gt[c], wt[c]) for c in gt
                         if c in wt and gt[c] != wt[c]}
            except Exception as e:  # DESCRIBE itself failed
                drift = {"<describe>": ("?", str(e)[:120])}
            if drift:
                rec["err"] = f"type drift {drift}"
                failures.append((name, f"type drift {drift}"))
                print(f"FAIL {name}: type drift (spark, duck): {drift}")
                continue
            rec["types_match"] = True
        gr, wr = frame_rows(got), frame_rows(want)
        rec["rows"] = len(gr)
        if len(gr) != len(wr):
            rec["err"] = f"rows {len(gr)} != {len(wr)}"
            failures.append((name, f"rows {len(gr)} != {len(wr)}"))
            print(f"FAIL {name}: row count {len(gr)} != {len(wr)}")
            continue
        rec["rows_match"] = True
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
        if bad:
            rec["err"] = f"{len(bad)} mismatched rows"
            failures.append((name, f"{len(bad)} mismatched rows"))
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first:")
            for i, a, b in bad[:3]:
                print(f"  row {i}\n   spark={a}\n   duck ={b}")
        else:
            rec["cells_match"] = True
            print(f"OK   {name}: {len(gr)} rows, {len(g_cols)} cols")

    # queries with no oracle → rows-only note
    for d in sorted(out_dir.iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"NOTE {d.name}: no oracle, rows={n}")
            report[d.name] = {"rows_match": None, "cols_match": None,
                              "cells_match": None, "rows": n,
                              "err": None, "note": "no oracle (spec-verified)"}

    n_pass = len(oracle) - len(failures)
    print(f"\n{n_pass}/{len(oracle)} queries match")
    if json_path is not None:
        json_path.write_text(json.dumps({
            "summary": {"oracle_queries": len(oracle), "passed": n_pass,
                        "failed": len(failures), "sf_dir": sf_dir,
                        "no_oracle": len(report) - len(oracle)},
            "queries": report}, indent=1, default=str))
        print(f"wrote {json_path}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
