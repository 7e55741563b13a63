#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each Verify output parquet at <outDir>/<name>/, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the <sfDir>
tables, and compares (columns sorted by name, rows as-written, exact value
equality with NaN==NaN and None==None).

Dev-only tool (driver-side python is available on this box); the shipped
library is pure Scala/Spark.
"""
import sys, os, glob, json, math

import duckdb

def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    return repr(v)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        bad = None
        for r, (g, e) in enumerate(zip(got, exp)):
            gr = [norm(g[i]) for i in gi]
            er = [norm(e[i]) for i in ei]
            if gr != er:
                bad = (r, gr, er)
                break
        if bad:
            r, gr, er = bad
            print(f"FAIL {name}: row {r}\n  got {gr}\n  exp {er}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    # Lockstep guard (round-3 verdict #8): a committed bench.json whose key
    # set drifted from the live query surface means the round shipped
    # queries nobody measured (or measured queries that no longer exist).
    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.json")
    if not only and os.path.exists(bench_path):
        bench_keys = set(json.load(open(bench_path)).get("queries", {}))
        oracle_keys = set(oracles)
        if bench_keys != oracle_keys:
            missing = sorted(oracle_keys - bench_keys)
            stale = sorted(bench_keys - oracle_keys)
            print(f"WARN bench.json out of lockstep: unmeasured={missing} stale={stale}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
