#!/usr/bin/env python3
"""Local differential oracle checker — mimics the driver's t2 gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views of the
sfDir parquet tables, and compares: column names (sorted), DuckDB logical
column TYPES (the round-1 wound: DuckDB types integer SUM as HUGEINT while
Spark writes BIGINT — value-equal, hash-different), row count, and exact
cell equality in row order. The driver's hash is type-sensitive, so a type
mismatch here is a real failure even when every value matches.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            s_q = con.sql("SELECT * FROM read_parquet($files)",
                          params={"files": files})
            spark_cols, spark_types = list(s_q.columns), [str(t) for t in s_q.types]
            spark_rel = s_q.fetchall()
            d_q = con.sql(sql)
            duck_cols, duck_types = list(d_q.columns), [str(t) for t in d_q.types]
            duck_rel = d_q.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
        ok, msg = compare(spark_rel, spark_cols, spark_types,
                          duck_rel, duck_cols, duck_types)
        if ok:
            print(f"ok   {name}: {len(spark_rel)} rows")
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: "
          f"{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


def compare(s_rows, s_cols, s_types, d_rows, d_cols, d_types):
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    for c in sorted(s_cols):
        st = s_types[s_cols.index(c)]
        dt = d_types[d_cols.index(c)]
        if st != dt:
            return False, (f"column {c} TYPE differs: spark={st} duck={dt} "
                           "(driver hash is type-sensitive)")
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    d_ix = [d_cols.index(c) for c in sorted(d_cols)]
    for rn, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for ci, (si, di) in enumerate(zip(s_ix, d_ix)):
            a, b = sr[si], dr[di]
            if not cell_eq(a, b):
                return False, (f"row {rn} col {sorted(s_cols)[ci]}: "
                               f"spark={a!r} duck={b!r}")
    return True, ""


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb  # exact: determinism doctrine requires bit equality
    if isinstance(a, (int, str, bool)) or isinstance(b, (int, str, bool)):
        return a == b
    return str(a) == str(b)  # Decimal, timestamps, lists


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
