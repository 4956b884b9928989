#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Verify parquet output, sort columns by
name + rows by all columns, and compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    for name in sorted(oracle):
        sql = oracle[name]
        # SPARK_GRAFT_ONLY runs of Verify dump a subset; a missing result
        # dir means the query wasn't selected, not that it failed.
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = canon(duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: result parquet unreadable: {e}")
            failures += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle "
                  f"{list(exp.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            failures += 1
            continue
        bad = None
        ev, gv = exp.values, got.values
        for i in range(len(exp)):
            for j in range(len(exp.columns)):
                if not cells_equal(ev[i][j], gv[i][j]):
                    bad = (i, exp.columns[j], ev[i][j], gv[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, e, g = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={e!r} got={g!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    no_oracle = []
    for d in sorted(os.listdir(out_dir)):
        if d not in oracle and os.path.isdir(f"{out_dir}/{d}"):
            n = duckdb.connect().execute(
                f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            no_oracle.append(f"{d}={n}")
    if no_oracle:
        print("rows-only:", ", ".join(no_oracle))
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
