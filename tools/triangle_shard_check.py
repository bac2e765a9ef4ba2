#!/usr/bin/env python3
"""Replica-scale verifier for q_triangle_count — the ONE oracle whose
single-query DuckDB form exceeds box resources at the 10x replica (the
unrolled wedge join wants >48GB memory and spills past the free disk;
see SCALE.md 9.21). Same math, bounded peak: materialize the oriented
edge list `en` once, then run the wedge+closing stage per u-shard and
accumulate per-node triangle counts in python. Each shard's working set
is ~1/NSHARDS of the wedge candidates, so memory is bounded regardless
of replica factor. The final comparison is the same rows+values check
oracle_check.py does (counts are exact integers).

Usage: triangle_shard_check.py SF_DIR SPARK_OUT_DIR [NSHARDS]
"""
import sys
from collections import defaultdict

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='40GB'")
    li = f"{sf_dir}/lineitem.parquet"
    import os
    src = f"'{li}/*.parquet'" if os.path.isdir(li) else f"'{li}'"
    print("building oriented edge list en ...", flush=True)
    con.execute(f"""
      COPY (
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                    FROM {src}),
        e AS (SELECT DISTINCT x.p AS a, y.p AS b
              FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
        deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
                FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
                GROUP BY 1),
        en AS (
          SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b
            END AS u,
            CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v,
            CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d
            END AS dv
          FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b)
        SELECT u, v, dv FROM en
      ) TO '/tmp/en_shard_check.parquet' (FORMAT PARQUET)""")
    n_edges = con.sql(
        "SELECT count(*) FROM '/tmp/en_shard_check.parquet'").fetchone()[0]
    print(f"en: {n_edges} oriented edges; {nshards} shards", flush=True)

    counts = defaultdict(int)
    for s in range(nshards):
        rows = con.sql(f"""
          WITH en AS (SELECT * FROM '/tmp/en_shard_check.parquet'),
          tris AS (
            SELECT w.u AS x, w.v1 AS y, w.v2 AS z FROM (
              SELECT e1.u AS u, e1.v AS v1, e2.v AS v2
              FROM en e1 JOIN en e2
                ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
              WHERE e1.u % {nshards} = {s}) w
            JOIN en e3 ON e3.u = w.v1 AND e3.v = w.v2)
          SELECT n, CAST(count(*) AS BIGINT)
          FROM (SELECT x AS n FROM tris UNION ALL SELECT y FROM tris
                UNION ALL SELECT z FROM tris)
          GROUP BY 1""").fetchall()
        for n, c in rows:
            counts[n] += c
        print(f"shard {s}: {len(rows)} nodes touched", flush=True)

    got = con.sql(f"""SELECT p_partkey, n_triangles
                      FROM '{out_dir}/q_triangle_count/*.parquet'
                      ORDER BY p_partkey""").fetchall()
    want = sorted(counts.items())
    got_sorted = sorted((int(a), int(b)) for a, b in got)
    if got_sorted == want:
        print(f"PASS q_triangle_count ({len(want)} rows, sharded oracle)")
        sys.exit(0)
    only_g = set(got_sorted) - set(want)
    only_w = set(want) - set(got_sorted)
    print(f"FAIL: spark-only {list(only_g)[:5]} duck-only {list(only_w)[:5]}")
    sys.exit(1)


if __name__ == "__main__":
    main()
