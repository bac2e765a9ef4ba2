#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: schema (column names sorted), row count, and values in row order.
This is a dev tool only — the engine itself never depends on it.
"""
import json
import math
import sys

import duckdb


def canon(v):
    if v is None:
        return r"\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = got.fetchall()
            got_idx = [got.columns.index(c) for c in got_cols]
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = exp.fetchall()
            exp_idx = [exp.columns.index(c) for c in exp_cols]
        except Exception as e:
            print(f"FAIL {name}: error: {str(e)[:300]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            gc = [canon(g[j]) for j in got_idx]
            ec = [canon(e[j]) for j in exp_idx]
            if gc != ec:
                bad = (i, gc, ec)
                break
        if bad:
            i, gc, ec = bad
            print(f"FAIL {name}: row {i}:\n  spark={gc}\n  duck ={ec}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
