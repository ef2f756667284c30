#!/usr/bin/env python3
"""sf1 head-to-head driver for the two floor-class bench rows (r11
verdict #5): generates a 10x-sf0.1 synthetic documents table (the mm
fixtures derive all content from doc_id alone, so 50k ids == sf1 for
these operators), times the registered DuckDB oracles over it
(best-of-3, warm process — the BASELINE.md methodology), and prints
the rows to compare against `sbt "runMain graft.tools.G7HeadToHead"`.

Usage: python3 tools/g7_headtohead.py [outdir=/tmp/graft_sf1] [n=50000]
Needs an oracle_sql.json dump (run graft.Verify once to produce it).
"""
import json
import os
import sys
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
oracle = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_out/oracle_sql.json"

os.makedirs(outdir, exist_ok=True)
path = f"{outdir}/documents.parquet"
if not os.path.exists(path):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array([""] * n, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
        "source": pa.array(["syn"] * n, type=pa.string()),
        "n_chars": pa.array([0] * n, type=pa.int64()),
    }), path)
    print(f"wrote {path} ({n} ids)")

sqls = json.load(open(oracle))
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
for q in ["ns_mm_phash_dups_g7", "ns_mm_video_incremental"]:
    times = []
    for _ in range(3):
        t0 = time.time()
        rows = con.sql(sqls[q]).fetchall()
        times.append(time.time() - t0)
    print(f"[g7-h2h] {q} duckdb rows={len(rows)} best3={min(times):.2f}s "
          f"all={[round(t, 2) for t in times]}")
