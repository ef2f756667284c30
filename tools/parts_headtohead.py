#!/usr/bin/env python3
"""sf1 head-to-head DuckDB side for the three ns_parts_* floor-class
rows (r12 verdict #3). Reads the 10x-sf0.1 parquet written by
`sbt "runMain graft.tools.PartsHeadToHead"` (which also dumps the
registered oracle SQLs as parts_oracle.json next to the data), and
times each oracle best-of-3 on a warm process — the BASELINE.md
methodology. Both engines read the SAME files, so the ratio is fair.

Usage: python3 tools/parts_headtohead.py [dir=/tmp/graft_sf1_tpch]
"""
import glob
import json
import os
import sys
import time

import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1_tpch"
sqls = json.load(open(f"{d}/parts_oracle.json"))
con = duckdb.connect()
for t in ["lineitem", "part", "supplier", "nation"]:
    p = f"{d}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
n = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
for q, sql in sqls.items():
    times = []
    for _ in range(3):
        t0 = time.time()
        rows = con.sql(sql).fetchall()
        times.append(time.time() - t0)
    print(f"[parts-h2h] {q} duckdb lineitem_rows={n} rows={len(rows)} "
          f"best3={min(times):.2f}s all={[round(t, 2) for t in times]}")
