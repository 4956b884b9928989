#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Verify parquet output, sort columns by
name + rows by all columns, and compare values exactly.

STRICT MODE (round 8, after the round-7 postmortem): the old checker
coerced cells through float() and compared with ==, which is structurally
blind to (a) dtype drift — DuckDB promoting a BIGINT sum to HUGEINT
(pandas object dtype) while Spark writes int64 — and (b) IEEE signed zero
(-0.0 == +0.0 but hashes differently). Both bit the driver's typed-bits
hash in round 7 while this gate said green. Now:

  * per-column dtype equality is required between oracle and result frames;
  * any `object`-dtype oracle column (the pandas signature of HUGEINT /
    DECIMAL / mixed cells) fails outright with a "CAST the oracle" hint;
  * floats compare by their little-endian IEEE-754 bit pattern
    (struct.pack): any NaN pair is equal, but -0.0 != +0.0.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import struct
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
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Bitwise: distinguishes -0.0 from +0.0, exactly like the
        # driver's typed-bits hash.
        return struct.pack('<d', a) == struct.pack('<d', b)
    if isinstance(a, float) != isinstance(b, float):
        return False  # dtype drift inside an object column
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
        # Dtype strictness: an object-dtype oracle column means DuckDB
        # produced HUGEINT/DECIMAL (or mixed) cells — the driver's hash
        # will disagree with Spark's int64/float64 even when values are
        # numerically equal. Fail loudly with the fix.
        bad_dtype = [c for c in exp.columns if str(exp[c].dtype) == "object"
                     and not all(isinstance(v, (str, bytes, list, dict,
                                                type(None)))
                                 for v in exp[c].head(50))]
        if bad_dtype:
            print(f"FAIL {name}: oracle columns {bad_dtype} are object-"
                  f"dtype (HUGEINT/DECIMAL?) — CAST them in the oracle SQL")
            failures += 1
            continue
        dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                       for c in exp.columns
                       if str(exp[c].dtype) != str(got[c].dtype)]
        if dt_mismatch:
            print(f"FAIL {name}: dtype mismatch (col, spark, oracle): "
                  f"{dt_mismatch}")
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
