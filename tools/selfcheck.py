#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same testdata
tables, and compare row-by-row with columns sorted by name.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)

fails = 0
for qname, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{qname}"
    if not os.path.isdir(qdir):
        print(f"FAIL {qname}: no spark output"); fails += 1; continue
    try:
        spark_t = pq.read_table(qdir)
    except Exception as e:
        print(f"FAIL {qname}: unreadable spark output: {e}"); fails += 1; continue
    try:
        duck_t = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {qname}: oracle error: {e}"); fails += 1; continue
    scols = sorted(spark_t.column_names)
    dcols = sorted(duck_t.column_names)
    if scols != dcols:
        print(f"FAIL {qname}: columns {scols} vs {dcols}"); fails += 1; continue
    srows = sorted([tuple(norm(r[c]) for c in scols) for r in spark_t.to_pylist()])
    drows = sorted([tuple(norm(r[c]) for c in dcols) for r in duck_t.to_pylist()])
    if len(srows) != len(drows):
        print(f"FAIL {qname}: rowcount {len(srows)} vs {len(drows)}"); fails += 1; continue
    if srows != drows:
        bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        print(f"FAIL {qname}: value mismatch; first diffs (cols={scols}):")
        for a, b in bad:
            print("  spark:", a)
            print("  duck :", b)
        fails += 1
        continue
    print(f"PASS {qname} ({len(srows)} rows)")
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
