#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify at a given SF dir (default sf0.01), then executes each
oracle_sql.json entry in DuckDB over the same parquet tables and compares:
schema (column names sorted), row count, and values (exact match after
sorting rows by all columns; floats compared bit-exact since both sides
round identically).

Usage: python3 scripts/check.py [sfdir] [--skip-verify] [only_query ...]
"""
import json, math, subprocess, sys, os, glob

SF = "/root/testdata/sf0.01"
args = [a for a in sys.argv[1:]]
skip = "--skip-verify" in args
args = [a for a in args if a != "--skip-verify"]
if args and os.path.isdir(args[0]):
    SF = args[0]; args = args[1:]
only = set(args)
# per-SF dump dir: concurrent checks at different SFs must not race
OUT = f"/tmp/graft_verify_{os.path.basename(SF.rstrip('/'))}"

if not skip:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines() if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{OUT}/{name}"
    if not glob.glob(f"{pdir}/*.parquet"):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}"); fails += 1; continue
    bad = None
    for c in gc:
        gv, wv = list(g[c]), list(w[c])
        for i, (a, b) in enumerate(zip(gv, wv)):
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and (a == b or (math.isnan(a) and math.isnan(b))))
            if not eq:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}"); fails += 1
    else:
        print(f"ok   {name}  ({len(g)} rows)")
print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
