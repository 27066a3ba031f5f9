#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + <out>/oracle_sql.json), then execute each
oracle in DuckDB over the same sf dir and compare values exactly.

Usage: tools/check.py [outDir] [sfDir] [query_prefix]
"""
import duckdb, json, sys, glob, os

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
prefix = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
rows_only = []
for name in sorted(os.listdir(out)):
    qdir = os.path.join(out, name)
    if not os.path.isdir(qdir) or not name.startswith(prefix):
        continue
    marker = os.path.join(qdir, "_FAILED")
    if os.path.exists(marker):
        msg = open(marker).read().strip().splitlines()
        print(f"!! {name}: QUERY FAILED: {msg[0] if msg else '?'}")
        fail += 1
        continue
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"!! {name}: NO SPARK OUTPUT")
        fail += 1
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"!! {name}: ORACLE SQL ERROR: {str(e).splitlines()[0]}")
        fail += 1
        continue
    # driver-style compare: columns sorted by name, then row-sorted values
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"!! {name}: COLUMNS differ spark={gcols} oracle={ecols}")
        fail += 1
        continue
    g = got[gcols]
    e = exp[ecols]
    if len(g) != len(e):
        print(f"!! {name}: ROWCOUNT spark={len(g)} oracle={len(e)}")
        fail += 1
        continue
    g = g.sort_values(gcols, kind="mergesort").reset_index(drop=True)
    e = e.sort_values(ecols, kind="mergesort").reset_index(drop=True)
    try:
        import pandas as pd
        diffs = []
        for c in gcols:
            gv, ev = g[c], e[c]
            if str(gv.dtype) != str(ev.dtype):
                diffs.append(f"dtype[{c}]: {gv.dtype} vs {ev.dtype}")
            eqmask = (gv == ev) | (gv.isna() & ev.isna())
            if not eqmask.all():
                i = int((~eqmask).idxmax())
                diffs.append(f"val[{c}]@{i}: {gv[i]!r} vs {ev[i]!r} "
                             f"({int((~eqmask).sum())} rows)")
        if diffs:
            print(f"!! {name}: " + "; ".join(diffs[:4]))
            fail += 1
        else:
            print(f"ok {name} ({len(g)} rows)")
            ok += 1
    except Exception as ex:
        print(f"!! {name}: COMPARE ERROR {ex}")
        fail += 1

for name, n in rows_only:
    print(f"-- {name}: rows-only ({n} rows)")
print(f"\n{ok} ok, {fail} fail, {len(rows_only)} rows-only")
sys.exit(1 if fail else 0)
