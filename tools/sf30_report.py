#!/usr/bin/env python3
"""Summarize a paired scale-regime bench artifact (round-15 verdict
item 1): per-row Spark-vs-DuckDB ratios at sf30 for the flagged rows
and the substantive surface, printed as a BASELINE-ready table.

Usage: sf30_report.py ORACLE_sf30_r15.json [flagged.csv-names]
"""
import json, sys

FLAGGED = ["q_data_mix", "q_dedup_exact", "q_pack_chunks",
           "q_top_talkers", "q_mm_resize", "q_mm_features",
           "q_ann_bruteforce", "q_correlated_exists", "q_anti_join",
           "q1_pricing_summary", "q_skew_salted_agg"]

d = json.load(open(sys.argv[1]))
sp = d["spark_scaled_queries"]
oq = d["oracle_run"]["queries"]
rows = sorted((k, sp[k], oq[k]) for k in sp
              if isinstance(oq.get(k), (int, float)))
errs = {k: v for k, v in oq.items() if not isinstance(v, (int, float))}
print(f"paired rows: {len(rows)}; oracle errors: {errs}")
print(f"{'row':30s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>6s}  flag")
tot_s = tot_o = 0.0
over2 = []
for k, s, o in rows:
    r = s / o if o > 0 else float("inf")
    tot_s += s; tot_o += o
    f = "FLAGGED" if k in FLAGGED else ""
    mark = " >2x" if r > 2 else ""
    if r > 2:
        over2.append(k)
    print(f"{k:30s} {s:8.2f} {o:8.2f} {r:6.2f} {f}{mark}")
print(f"{'TOTAL':30s} {tot_s:8.1f} {tot_o:8.1f} {tot_s/tot_o:6.2f}")
fl = [(k, s, o) for k, s, o in rows if k in FLAGGED]
fs, fo = sum(x[1] for x in fl), sum(x[2] for x in fl)
print(f"\nflagged subset ({len(fl)}): spark {fs:.1f}s duck {fo:.1f}s "
      f"ratio {fs/fo:.2f}")
print("flagged >2x at sf30:",
      [k for k, s, o in fl if o > 0 and s / o > 2] or "none")
print("all >2x at sf30:", over2 or "none")
