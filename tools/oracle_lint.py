#!/usr/bin/env python3
"""Oracle-schema lint: DESCRIBE every `SparkEntry.oracleSql` entry in
DuckDB and fail if any RESULT column has a type Spark's parquet writer
can never emit — HUGEINT/UHUGEINT (what DuckDB silently promotes BIGINT
sums, window sums, and `//` quotients to) or DECIMAL. A flagged column
means the driver's typed-bits hash is guaranteed to mismatch even when
every value is numerically equal: the fix is always a CAST in the oracle
SQL. This makes the bug class that produced all four round-7 reds
unwritable — the lint runs at schema level (DESCRIBE, zero rows), so it
is fast enough for every local iteration and for OracleLintSpec.

Usage: python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
Exit 0 = clean, 1 = at least one flagged oracle.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BANNED = ("HUGEINT", "DECIMAL")  # HUGEINT also matches UHUGEINT


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    bad = 0
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        flagged = [(c, ty) for c, ty, *_ in cols
                   if any(b in ty.upper() for b in BANNED)]
        if flagged:
            print(f"FAIL {name}: {flagged} — CAST these in the oracle SQL "
                  f"(Spark writes BIGINT/DOUBLE; the hash compares bits)")
            bad += 1
    print(f"oracle_lint: {len(oracle)} oracles, {bad} flagged")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
