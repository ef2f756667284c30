#!/usr/bin/env python3
"""sf1 DuckDB ratio side for the three composed capstones (r12 verdict
#8). Reads the 10x-sf0.1 parquet written by
`sbt "runMain graft.tools.CapstoneSf1"` plus its capstone_oracle.json
dump, and times each oracle once under a wall-clock budget. The funnel
oracles are blocked-all-pairs + recursive-CTE SQL — their cost at sf1
is the honest comparison point (the Spark side replaces that shape
with LSH banding + converging label propagation), so a timeout is a
RESULT to publish, not an error.

Usage: python3 tools/capstone_sf1.py [dir=/tmp/graft_sf1_caps] [budget_s=900]
"""
import json
import os
import sys
import threading
import time

import duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1_caps"
budget = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0
sqls = json.load(open(f"{d}/capstone_oracle.json"))
for q, sql in sqls.items():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        p = f"{d}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        rows = con.sql(sql).fetchall()
        print(f"[caps-sf1] {q} duckdb rows={len(rows)} wall={time.time()-t0:.1f}s")
    except Exception as e:
        print(f"[caps-sf1] {q} duckdb DNF after {time.time()-t0:.0f}s "
              f"(budget {budget:.0f}s): {type(e).__name__}")
    finally:
        timer.cancel()
        con.close()
