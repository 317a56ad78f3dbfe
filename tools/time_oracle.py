#!/usr/bin/env python3
"""Same-host DuckDB oracle timing: runs every oracle_sql.json statement
over a data dir (driver testdata file-per-table or ScaleData mirror
dir-per-table), warm min-of-2, 32 threads — the BASELINE.md methodology.

Usage: time_oracle.py <dataDir> [oracle_sql.json] [query ...]
"""
import duckdb, json, time, sys, os

data = sys.argv[1]
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
only = set(sys.argv[3:])
sqls = json.load(open(oracle_path))
con = duckdb.connect()
con.execute("SET threads=32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{data}/{t}.parquet"
    if not os.path.exists(p):
        continue
    src = p + "/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
times = {}
for name in sorted(sqls):
    if only and name not in only:
        continue
    try:
        con.execute(sqls[name]).fetchall()  # warm
        ts = []
        for _ in range(2):
            t0 = time.time()
            con.execute(sqls[name]).fetchall()
            ts.append(time.time() - t0)
        times[name] = round(min(ts), 3)
        print(f"  {name}: {times[name]}", file=sys.stderr, flush=True)
    except Exception as e:
        times[name] = "ERR:" + str(e)[:80]
        print(f"  {name}: {times[name]}", file=sys.stderr, flush=True)
total = round(sum(v for v in times.values() if isinstance(v, float)), 2)
print(json.dumps({"dir": data, "total": total, "n": len(times),
                  "queries": times}))
