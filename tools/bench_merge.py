#!/usr/bin/env python3
"""Merge N bench_metric sweeps into one min-per-query metric file.

The host VM's speed oscillates session-long (documented in SURVEY
section 15: five sweeps, 82.9 -> 134.5 s on byte-identical code), so a
single end-of-round sweep is hostage to whichever host state it lands
on.  Bench already takes min-of-N passes WITHIN a sweep; this extends
the same estimator ACROSS sweeps: for every query take the minimum of
its per-sweep minima -- the best-observed time is the least-noise
estimate of the code's actual cost under a stall-prone host.

Usage: bench_merge.py out.json sweep1.json sweep2.json [...]
       bench_merge.py --fresh fresh.json out.json sweep1.json [...]

The output keeps the bench_metric schema: `queries` holds the
cross-sweep min per query, `value` their sum, `spread` the per-sweep
minima (ascending) so the cross-sweep oscillation stays visible, and
`failed` the union of per-sweep failures (any failure anywhere must
not be hidden by a clean sibling sweep).

`--fresh fresh.json` (produced by tools/bench_fresh.py) attaches a
`fresh_jvm` column: standalone min-of-N timings for selected heavy
queries, each measured in its OWN JVM -- separating in-sweep JVM
heap/GC context and cross-query memo reuse from a query's intrinsic
cost (round-13 verdict task: the composed prepares' in-sweep numbers
carry both effects).
"""
import json
import sys


def main() -> int:
    argv = sys.argv[1:]
    fresh_path = None
    if "--fresh" in argv:
        i = argv.index("--fresh")
        fresh_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 3:
        sys.stderr.write(__doc__)
        return 2
    out, paths = argv[0], argv[1:]
    sweeps = [json.load(open(p)) for p in paths]
    names = set(sweeps[0]["queries"])
    for p, s in zip(paths, sweeps):
        if set(s["queries"]) != names:
            sys.stderr.write(f"query sets differ: {paths[0]} vs {p}\n")
            return 1
        if s["sf"] != sweeps[0]["sf"]:
            sys.stderr.write(f"sf differs: {sweeps[0]['sf']} vs {s['sf']}\n")
            return 1
    queries = {n: min(s["queries"][n] for s in sweeps) for n in sorted(names)}
    merged = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "n_sweeps": len(sweeps),
        "spread": {n: sorted(s["queries"][n] for s in sweeps)
                   for n in sorted(names)},
        "queries": queries,
        "failed": sorted({f for s in sweeps for f in s.get("failed", [])}),
        "sf": sweeps[0]["sf"],
    }
    if fresh_path:
        fr = json.load(open(fresh_path))
        unknown = set(fr["fresh_jvm"]) - names
        if unknown:
            sys.stderr.write(f"fresh-JVM queries not in sweeps: {unknown}\n")
            return 1
        merged["fresh_jvm"] = fr["fresh_jvm"]
    with open(out, "w") as f:
        json.dump(merged, f)
    print(f"{out}: {merged['value']:.1f} s over {len(names)} queries, "
          f"min across {len(sweeps)} sweeps, "
          f"failed={merged['failed']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
