#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify's output
parquet per query, runs the corresponding oracle SQL in DuckDB over the
same sfDir tables, and compares (columns sorted by name, values hashed).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value canonicalization: repr of float
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    return str(v)

def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql)
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1
            continue
        g, w = table_key(grows, gcols), table_key(wrows, wcols)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (spark {len(g)} vs oracle {len(w)})")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                i = min(len(g), len(w))
                a = g[i] if i < len(g) else None
                b = w[i] if i < len(w) else None
                print(f"  length diff at row {i}:\n    spark : {a}\n    oracle: {b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
