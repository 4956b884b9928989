#!/usr/bin/env python3
"""Fresh-JVM standalone timings for selected (heavy) queries.

Runs `sbt -batch "runMain graft.Bench <q>"` once PER QUERY, each in its
own JVM, and collects the per-query min-of-N into one JSON — the input
`tools/bench_merge.py --fresh` attaches as the `fresh_jvm` column.
A fresh JVM isolates the query from in-sweep heap/GC context and from
cross-query memo reuse (fingerprint-memoized models survive a sweep's
per-query cache clears by design), so the column separates a query's
intrinsic cost from the sweep's shared-state effects.

Usage: bench_fresh.py out.json sfdir query [query...]

WARNING: each single-query Bench run OVERWRITES bench_metric.json in
the working directory — copy a full-sweep metric aside before running.
"""
import json
import os
import subprocess
import sys


def main() -> int:
    if len(sys.argv) < 4:
        sys.stderr.write(__doc__)
        return 2
    out, sfdir, queries = sys.argv[1], sys.argv[2], sys.argv[3:]
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_CPUS="32")
    fresh = {}
    for q in queries:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Bench {q}"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            sys.stderr.write(f"fresh-JVM bench failed for {q}\n")
            return 1
        m = json.load(open("bench_metric.json"))
        fresh[q] = m["queries"][q]
        print(f"fresh {q}: {fresh[q]:.2f} s")
    with open(out, "w") as f:
        json.dump({"sf": sfdir, "fresh_jvm": fresh}, f)
    print(f"{out}: {len(fresh)} fresh-JVM timings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
