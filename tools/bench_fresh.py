#!/usr/bin/env python3
"""Fresh-JVM standalone timings for selected (heavy) queries.

Runs `sbt -batch "runMain graft.Bench <q>"` once PER QUERY, each in its
own JVM, and collects the per-query min-of-N into one JSON — the input
`tools/bench_merge.py --fresh` attaches as the `fresh_jvm` column.
A fresh JVM isolates the query from in-sweep heap/GC context and from
cross-query memo reuse (fingerprint-memoized models survive a sweep's
per-query cache clears by design), so the column separates a query's
intrinsic cost from the sweep's shared-state effects.

Usage: bench_fresh.py [--cpus N] out.json sfdir [query ...]

With no queries, runs DEFAULT_QUERIES (the heaviest composed prepares
plus the kn-family queries whose in-sweep spread is memo-build
context). The CPU budget is taken from --cpus, else the caller's
SPARK_GRAFT_CPUS, else 32 — and is RECORDED in the output JSON so the
fresh_jvm column can never silently measure a different configuration
than the sweeps it is attached to (r14 advice). Each child writes its
metric to a per-query temp path via SPARK_GRAFT_METRIC_OUT, so a
concurrent full-sweep Bench run can never clobber the file mid-read.
"""
import json
import os
import subprocess
import sys
import tempfile

# The heaviest composed prepares + the kn family (r14: the kn queries'
# in-sweep spread — e.g. text_kn5_logprob_ref [2.95, 3.43, 10.5] s in
# r13, the max being the first pass paying the ref-model memo build —
# is exactly the in-sweep-context effect this column separates).
DEFAULT_QUERIES = [
    "pipeline_full_prepare_ppl",
    "pipeline_full_prepare_ppl_ref",
    "pipeline_full_prepare_ppl_refd",
    "pipeline_full_prepare_trained",
    "pipeline_crawl_prepare_langid",
    "pipeline_url_prepare",
    "text_kn5_logprob",
    "text_kn5_logprob_ref",
    # r16 (r15 verdict #3): the decon plane build is build-once work —
    # exactly what the fresh-JVM column exists to expose
    "pipeline_decontaminate_static",
    "pipeline_decontaminate_suites",
]


def main() -> int:
    args = sys.argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if args and args[0] == "--cpus":
        cpus = args[1]
        args = args[2:]
    if len(args) < 2:
        sys.stderr.write(__doc__)
        return 2
    out, sfdir = args[0], args[1]
    queries = args[2:] or DEFAULT_QUERIES
    fresh = {}
    for q in queries:
        with tempfile.NamedTemporaryFile(
                prefix=f"bench_fresh_{q}_", suffix=".json") as tmp:
            env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir,
                       SPARK_GRAFT_CPUS=cpus,
                       SPARK_GRAFT_METRIC_OUT=tmp.name)
            r = subprocess.run(
                ["sbt", "-batch", f"runMain graft.Bench {q}"],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            if r.returncode != 0:
                sys.stderr.write(f"fresh-JVM bench failed for {q}\n")
                return 1
            m = json.load(open(tmp.name))
        fresh[q] = m["queries"][q]
        print(f"fresh {q}: {fresh[q]:.2f} s")
    with open(out, "w") as f:
        json.dump({"sf": sfdir, "cpus": int(cpus), "fresh_jvm": fresh}, f)
    print(f"{out}: {len(fresh)} fresh-JVM timings (cpus={cpus})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
