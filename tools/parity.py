#!/usr/bin/env python3
"""Dev-only parity checker: replicates the driver's t2 gate locally.

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the same
parquet fixture tables, canonicalizes both result sets (columns sorted by
name, doubles rounded to 1e-9, timestamps as UTC ISO, rows sorted), and
diffs them. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/parity.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 9):.9f}"
    if hasattr(v, "isoformat"):  # datetime/date
        s = v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
        return s
    if isinstance(v, list):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    n_skip = 0
    for name in sorted(oracles):
        sql = oracles[name]
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1  # not dumped (filtered Verify run) — not a failure
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns differ spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        _, s_rows = canon_rows(spark_cols, spark_rows)
        _, d_rows = canon_rows(duck_cols, duck_rows)
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} duck={diffs[0][1]}")
            print(f"     cols sorted: {sorted(spark_cols)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail" + (f" ({n_skip} not dumped)" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
