#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: schema (column names sorted), row count, and values in row order.

Values are compared TYPE-AWARE (hardened after round 1, where a str()-based
canon passed 11 queries the driver failed): a DECIMAL column carries its
(precision, scale) in the canonical form, so DECIMAL(28,2) vs DECIMAL(38,2)
fails even when the digits agree, and a DuckDB HUGEINT (arrow decimal128(38,0))
fails against a Spark BIGINT. Integer WIDTHS (int32 vs int64) are tolerated —
the driver's round-1 verdicts show int-width diffs passing (q19/q22/q27) while
every decimal/hugeint diff failed.

This is a dev tool only — the engine itself never depends on it.
"""
import json
import math
import sys

import duckdb
import pyarrow as pa

NULL = r"\N"


def canon_fn(t):
    """Per-column canonicalizer chosen from the arrow type (driver-replica)."""
    if pa.types.is_decimal(t):
        tag = f"dec({t.precision},{t.scale}):"
        return lambda v: NULL if v is None else tag + str(v)
    if pa.types.is_floating(t):
        def f(v):
            if v is None:
                return NULL
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        return f
    if pa.types.is_boolean(t):
        return lambda v: NULL if v is None else str(v).lower()
    # integers of any width (and strings, timestamps, …) render by value
    return lambda v: NULL if v is None else str(v)


def arrow_table(rel):
    a = rel.arrow()
    if not isinstance(a, pa.Table):  # newer duckdb returns a reader
        a = a.read_all()
    return a


def type_key(t):
    """Type identity the driver distinguishes: decimals strict, ints pooled."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    return str(t)


def connect(sf_dir):
    """Fresh connection with the table views registered. Replica-scale
    runs exhaust a SHARED connection: buffer-pool state accumulates
    across queries until a tiny allocation fails and every later query
    inherits the OOM (observed at the 10x replica — q_ewma fails in
    sequence, passes alone). A per-query connection bounds memory at the
    single heaviest query; view registration is metadata-only."""
    import os
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # an in-memory duckdb cannot spill without a temp_directory
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # default sized for replica-scale runs; heavy single queries (the
    # unrolled triangle oracle at 10x spills past the box's free disk at
    # 48GB) can raise it per-invocation
    con.execute("SET memory_limit='%s'"
                % os.environ.get("DUCKDB_MEMLIMIT", "48GB"))
    # bounded threads (r14): at higher thread counts the ORDERED
    # aggregates some oracles use (q_ewma's per-group ORDER BY sums)
    # hold per-thread state that cannot spill — at the 10x replica that
    # dies with "Failed to allocate block" at threads>=8 even with a
    # 90GB limit, 100GB+ free RAM and a temp_directory (measured:
    # threads=4 passes at the default 48GB limit). Correctness runs are
    # not timed, so the safe default wins; DUCKDB_THREADS overrides.
    con.execute("SET threads=%d"
                % int(os.environ.get("DUCKDB_THREADS", "4")))
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        # partial dirs (ScaleBench replicas) carry only the tables their
        # queries read — register what exists, the rest would fail anyway
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.isdir(p):  # Spark-written replica: a directory of parts
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{p}'")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        verdict = check_one(sf_dir, out_dir, name, sql)
        print(verdict)
        if verdict.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def check_one(sf_dir, out_dir, name, sql):
    """One query, one connection, everything freed on return — replica-
    scale outputs (1M-row q_ewma) otherwise accumulate arrow buffers +
    buffer-pool state across queries until allocation fails for every
    later query (the 10x-replica OOM cascade)."""
    con = connect(sf_dir)
    try:
        try:
            got = arrow_table(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            exp = arrow_table(con.sql(sql))
        except Exception as e:
            return f"FAIL {name}: error: {str(e)[:300]}"
        got_cols = sorted(got.column_names)
        exp_cols = sorted(exp.column_names)
        if got_cols != exp_cols:
            return f"FAIL {name}: columns {got_cols} != {exp_cols}"
        if got.num_rows != exp.num_rows:
            return f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}"
        type_bad = []
        for c in got_cols:
            gt = got.schema.field(c).type
            et = exp.schema.field(c).type
            if type_key(gt) != type_key(et):
                type_bad.append(f"{c}: spark={gt} duck={et}")
        if type_bad:
            return f"FAIL {name}: column types differ: {'; '.join(type_bad)}"
        for c in got_cols:
            fn = canon_fn(got.schema.field(c).type)
            gv = got.column(c).to_pylist()
            ev = exp.column(c).to_pylist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                gc, ec = fn(g), fn(e)
                if gc != ec:
                    return (f"FAIL {name}: row {i} col {c}:"
                            f"\n  spark={gc}\n  duck ={ec}")
            del gv, ev
        return f"PASS {name} ({got.num_rows} rows)"
    finally:
        con.close()


if __name__ == "__main__":
    main()
