#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only —
the Scala library never depends on this).

Usage: python3 tools/check_oracle.py [sfdir] [outdir]

1. Runs graft.Verify via sbt (writes each SparkEntry.queries result to
   outdir/<name>/ parquet + outdir/oracle_sql.json).
2. Registers every /root/testdata parquet table as a DuckDB view.
3. Runs each oracle SQL, compares to the Spark parquet: schema (column
   names), row count, and a value hash with columns sorted by name and
   rows sorted by all columns.
"""
import sys, os, json, subprocess, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP_VERIFY = os.environ.get("SKIP_VERIFY") == "1"

if not SKIP_VERIFY:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracles.items()):
    spark_dir = f"{OUT}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        o = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    try:
        s = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark read error: {e}"); fail += 1; continue
    so, ss = sorted(o.columns), sorted(s.columns)
    if so != ss:
        print(f"FAIL {name}: columns {ss} vs oracle {so}"); fail += 1; continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows {len(s)} vs oracle {len(o)}"); fail += 1; continue
    o2 = o[so].sort_values(so).reset_index(drop=True)
    s2 = s[so].sort_values(so).reset_index(drop=True)
    import pandas as pd
    mism = []
    for c in so:
        a, b = o2[c], s2[c]
        # Driver hashes raw values: an int64-vs-float64 column (e.g. a
        # DuckDB HUGEINT sum pandas widens to float) hashes "1.0" vs "1"
        # even when numerically equal — flag the dtype-kind split.
        if {a.dtype.kind, b.dtype.kind} == {'f', 'i'}:
            mism.append(
                f"col {c}: dtype kind {s2[c].dtype} vs oracle {o2[c].dtype}"
                " (int/float split hashes differently)")
            continue
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            eq = (a.isna() & b.isna()) | (a == b)
        else:
            eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
        if not eq.all():
            i = int((~eq).idxmax())
            mism.append(f"col {c} row {i}: spark={s2[c][i]!r} oracle={o2[c][i]!r}")
    if mism:
        print(f"FAIL {name}: " + "; ".join(mism[:3])); fail += 1
    else:
        print(f"ok   {name} ({len(s)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
