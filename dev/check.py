#!/usr/bin/env python3
"""Dev-only correctness harness mirroring the driver's gate:
runs graft.Verify at a given SF, then replays each oracle SQL in DuckDB
over the same parquet tables and diffs against Spark's parquet output
(sorted rows, exact values). NOT part of the shipped library.

Usage: python3 dev/check.py [sfDir] [outDir] [--skip-verify]
"""
import sys, os, json, glob, subprocess
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import duckdb

pos = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = pos[0] if len(pos) > 0 else "/root/testdata/sf0.01"
out = pos[1] if len(pos) > 1 else "/tmp/graft_verify"

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f"runMain graft.Verify {sf} {out}"],
        cwd="/root/repo", capture_output=True, text=True)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver testdata ships single-file parquet; dev-generated scale
    # dirs (ScaleGen) are Spark-written DIRECTORIES — glob inside them
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# File-reading oracles pin the driver's verification SF (sf0.01) in
# their path; when checking another SF locally, rebase the path onto
# the SF under test so the oracle reads the file Verify just wrote.
sf_name = os.path.basename(sf.rstrip("/"))
if sf_name != "sf0.01":
    oracle = {k: v.replace("_sf0.01/", f"_{sf_name}/") for k, v in oracle.items()}
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        results[name] = "NO_SPARK_OUTPUT"; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_ERR {e}"; continue
    try:
        sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        results[name] = f"SPARK_READ_ERR {e}"; continue
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        results[name] = f"COLS oracle={list(o.columns)} spark={list(s.columns)}"; continue
    if len(o) != len(s):
        results[name] = f"ROWS oracle={len(o)} spark={len(s)}"; continue
    for c in o.columns:  # arrays are unhashable/unsortable in pandas
        if o[c].dtype == object:
            o[c] = o[c].astype(str); s[c] = s[c].astype(str)
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    o = o.astype(str); s = s.astype(str)
    if o.equals(s):
        results[name] = "OK"
    else:
        diff = (o != s).any(axis=1)
        i = diff[diff].index[0]
        results[name] = f"VALS first diff row {i}: oracle={o.loc[i].to_dict()} spark={s.loc[i].to_dict()}"

# rows-only entries (no oracle)
for d in sorted(glob.glob(f"{out}/*")):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            results[name] = f"ROWS_ONLY n={n}" + ("" if n > 0 else " !! EMPTY")
        except Exception as e:
            results[name] = f"ROWS_ONLY_ERR {e}"

# the rows-only set must never grow silently: every no-oracle entry
# needs a declared reason in dev/rows_only_audit.py
import rows_only_audit
audit_ok = rows_only_audit.audit(out) == 0

ok = sum(1 for v in results.values()
         if v == "OK" or (v.startswith("ROWS_ONLY n=") and "EMPTY" not in v))
for k, v in results.items():
    flag = "  " if (v == "OK" or (v.startswith("ROWS_ONLY n=") and "EMPTY" not in v)) else "XX"
    print(f"{flag} {k}: {v}")
print(f"\n{ok}/{len(results)} pass" + ("" if audit_ok else "  [rows-only audit FAILED]"))
if not audit_ok:
    sys.exit(1)
