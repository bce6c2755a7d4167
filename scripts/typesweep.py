#!/usr/bin/env python3
"""Output-type sweep: Spark dump schema vs DuckDB oracle output types.

The driver's correctness hash is type/format-sensitive in one specific
way: columns that pandas coerces to DIFFERENT dtypes on the two sides
red the row even when every value is equal. Known fatal pairs:
DuckDB DECIMAL vs Spark DOUBLE (r3 events_histogram p50_est) and
DuckDB HUGEINT vs Spark BIGINT (HUGEINT -> float64 through pandas).
Integer-width pairs (INTEGER/BIGINT/TINYINT) are benign — both sides
land in int64 (proven by many driver-green rows).

Run after scripts/check.py (which refreshes /tmp/graft_verify):

    python3 scripts/typesweep.py [sfDir]

Exits non-zero if any fatal pair appears.
"""
import duckdb
import json
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BENIGN = {frozenset(p) for p in (
    ("INTEGER", "BIGINT"), ("TINYINT", "BIGINT"), ("TINYINT", "INTEGER"),
    ("SMALLINT", "BIGINT"), ("SMALLINT", "INTEGER"))}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = f"/tmp/graft_verify_{os.path.basename(sf.rstrip('/'))}"
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fatal = benign = 0
    for q, sql in sorted(oracle.items()):
        try:
            sdf = con.sql(
                f"describe select * from read_parquet('{out}/{q}/*.parquet')").fetchall()
            odf = con.sql(f"describe ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            print(f"ERR  {q}: {str(e)[:120]}")
            fatal += 1
            continue
        s = {r[0]: r[1] for r in sdf}
        o = {r[0]: r[1] for r in odf}
        for k in sorted(set(s) | set(o)):
            ts, to = s.get(k), o.get(k)
            if ts == to:
                continue
            if ts and to and frozenset((ts, to)) in BENIGN:
                benign += 1
                continue
            print(f"FATAL {q}.{k}: spark={ts} oracle={to}")
            fatal += 1
    print(f"swept {len(oracle)} queries: {fatal} fatal, {benign} benign-width diffs")
    return 1 if fatal else 0


if __name__ == "__main__":
    sys.exit(main())
