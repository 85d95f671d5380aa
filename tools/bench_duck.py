#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given SF (the BASELINE side of BENCH).

Usage: bench_duck.py <sfDir> <oracle_sql.json>
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(oracle_path))
out = {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        out[name] = round(time.time() - t0, 4)
    except Exception as e:
        out[name] = -1.0
print(json.dumps({"total": round(sum(v for v in out.values() if v > 0), 3),
                  "queries": out}))
