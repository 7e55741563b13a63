#!/usr/bin/env python3
"""Bootstrap cross-round bench floor merge (round-9 verdict item 1).

Per-query min-merge across recording sessions/rounds:

    tools/merge_floor.py OUT.json RUN1.json [RUN2.json ...] \
        [--reset q1,q2,...]

Rule: a query's historical floor is its floor until its code changes.
Runs recorded AFTER plan fingerprints existed are merged by graft.Bench
itself (SPARK_GRAFT_BENCH_MERGE=1, keyed on bench_meta.json fingerprints)
— this script exists for the ONE bootstrap step where pre-fingerprint
recordings (rounds 8/9) are folded in: `--reset` names the queries whose
code/plan changed since those rounds (enumerated from git, recorded in
SCALE.md), which take the FIRST run's value (the newest recording)
instead of the historical min. Queries absent from the first run (since
renamed/removed) are dropped; queries new since the old runs keep their
new values untouched.

The output preserves the newest run's non-query fields (sf, unit).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:]]
    reset = set()
    if "--reset" in args:
        i = args.index("--reset")
        reset = set(args[i + 1].split(","))
        del args[i:i + 2]
    out_path, runs = args[0], [load(p) for p in args[1:]]
    newest = runs[0]
    merged = {}
    for name, v in newest["queries"].items():
        vals = [v]
        if name not in reset:
            vals += [r["queries"][name] for r in runs[1:]
                     if name in r.get("queries", {})]
        merged[name] = min(vals)
    doc = {"metric": newest.get("metric", "total"),
           "value": sum(merged.values()),
           "unit": newest.get("unit", "sec"),
           "queries": dict(sorted(merged.items())),
           "sf": newest.get("sf", "")}
    with open(out_path, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
        f.write("\n")
    lowered = sum(1 for n, v in merged.items()
                  if v < newest["queries"][n] - 1e-9)
    print(f"merged {len(runs)} runs -> {out_path}: "
          f"{len(merged)} queries, total {doc['value']:.1f}s, "
          f"{lowered} floors below the newest run, "
          f"{len(reset & set(merged))} reset by --reset")


if __name__ == "__main__":
    main()
