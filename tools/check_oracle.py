#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each parquet dump
written by graft.Verify, run the matching oracle SQL in DuckDB over the same
sf tables and compare (schema-insensitively: columns sorted by name, rows
sorted, values rounded for floats)."""
import json, math, sys
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'")
        s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: no spark dump ({e})"); fails += 1; continue
    try:
        duck_rel = con.sql(sql)
        d_cols, d_rows = duck_rel.columns, duck_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    sc, sr = canon(s_cols, s_rows)
    dc, dr = canon(d_cols, d_rows)
    if sc != dc:
        print(f"FAIL {name}: schema spark={sc} duck={dc}"); fails += 1; continue
    if sr != dr:
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
        only_s = [r for r in sr if r not in set(map(tuple, dr))][:3]
        only_d = [r for r in dr if r not in set(map(tuple, sr))][:3]
        print(f"  cols: {sc}")
        print(f"  only-spark: {only_s}\n  only-duck : {only_d}")
        fails += 1; continue
    print(f"OK   {name}: {len(sr)} rows")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
