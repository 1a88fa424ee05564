#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <name>.parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB (tables registered as views over the sfDir
parquet files), and compares: row count, column names, and exact values
(rows sorted with a type-aware key, columns sorted by name).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def sort_key(row):
    # None sorts before everything, by type name then value — keeps mixed
    # None/str/num rows orderable (Python 3 refuses None < str)
    return tuple((v is not None, type(v).__name__, v) for v in row)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                (tuple(norm(v) for v in row)
                 for row in con.sql(
                    f"SELECT {', '.join(got_cols)} FROM "
                    f"'{out_dir}/{name}/*.parquet'").fetchall()),
                key=sort_key)
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rel = con.sql(f"SELECT {', '.join(want_cols)} FROM ({sql})")
            want_rows = sorted(
                (tuple(norm(v) for v in row) for row in want_rel.fetchall()),
                key=sort_key)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols spark={got_cols} duck={want_cols}")
            n_fail += 1
        elif len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} duck={len(want_rows)}")
            n_fail += 1
        elif got_rows != want_rows:
            bad = [(a, b) for a, b in zip(got_rows, want_rows) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
