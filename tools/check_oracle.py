#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the testdata
tables, canonicalizes both (sort columns by name, sort rows, stringify),
and reports match/mismatch per query.
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.astype(str)
    rows = sorted([tuple(r) for r in df.itertuples(index=False)])
    return rows


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_noracle = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"  {name}: NO RESULT FILES")
            n_bad += 1
            continue
        got = pq.ParquetDataset(d).read().to_pandas()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows)"
                  + (" EMPTY!" if len(got) == 0 else ""))
            n_noracle += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        cg, cw = canon(got), canon(want)
        if cg == cw:
            print(f"  {name}: OK ({len(got)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            print(f"  {name}: MISMATCH spark={len(cg)} duckdb={len(cw)}")
            for i, (a, b) in enumerate(zip(cg, cw)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            if len(cg) != len(cw):
                only_g = set(cg) - set(cw)
                only_w = set(cw) - set(cg)
                if only_g:
                    print(f"    only-spark e.g. {list(only_g)[:2]}")
                if only_w:
                    print(f"    only-duck  e.g. {list(only_w)[:2]}")
    print(f"== {n_ok} ok, {n_bad} bad, {n_noracle} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
