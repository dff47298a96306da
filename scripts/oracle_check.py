#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: load Verify's parquet dumps,
run each oracle SQL in DuckDB over the same fixtures, compare row-sets.

usage: oracle_check.py [sfDir] [verifyOut]
"""
import json, sys, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def sortkey(row):
    return tuple((v is None, v if v is not None else 0) for v in row)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm(r[i]) for i in order) for r in rows),
                  key=sortkey), sorted(cols)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        exp = con.execute(sql)
        erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        g, gc = canon(grows, gcols)
        e, ec = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            fails += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}; first diffs: {diff}")
            fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    except Exception as ex:
        print(f"ERR  {name}: {str(ex)[:300]}")
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
