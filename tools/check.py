#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
given SF, then replay each oracle SQL in DuckDB over the same parquet
tables and compare values exactly (columns sorted by name, rows in
produced order, and also order-insensitively as a fallback diagnostic).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [names...]
"""
import sys, os, json, subprocess, math

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
rest = sys.argv[3:]
skip_verify = "--skip-verify" in rest
only = [a for a in rest if not a.startswith("--")]

if not skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb, pyarrow.parquet as pq

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (bytes, bytearray)): return v.hex()
    return v

def rows_of(cols, data):
    # columns sorted by name, like the driver
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in data]

names = only or sorted(oracle)
fails = []
for name in names:
    if name not in oracle:
        print(f"{name:28s} (no oracle — rows-only)"); continue
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"{name:28s} MISSING spark output"); fails.append(name); continue
    tbl = pq.read_table(pdir)
    scols = list(tbl.schema.names)
    srows = rows_of(scols, [tuple(d[c] for c in scols) for d in tbl.to_pylist()])
    try:
        res = con.sql(oracle[name])
        dcols = res.columns
        drows = rows_of(dcols, res.fetchall())
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {str(e)[:140]}"); fails.append(name); continue
    if sorted(scols) != sorted(dcols):
        print(f"{name:28s} SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
        fails.append(name); continue
    if srows == drows:
        print(f"{name:28s} OK ({len(srows)} rows)")
    elif sorted(map(repr, srows)) == sorted(map(repr, drows)):
        print(f"{name:28s} ORDER-ONLY MISMATCH ({len(srows)} rows)"); fails.append(name)
    else:
        print(f"{name:28s} VALUE MISMATCH spark={len(srows)} duck={len(drows)} rows")
        sset, dset = set(map(repr, srows)), set(map(repr, drows))
        for x in list(map(repr, srows))[:400]:
            if x not in dset: print(f"   spark-only: {x[:160]}"); break
        for x in list(map(repr, drows))[:400]:
            if x not in sset: print(f"   duck-only : {x[:160]}"); break
        # aligned row diff for same-length results
        if len(srows) == len(drows):
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"   row {i}: spark={str(a)[:150]}")
                    print(f"   row {i}: duck ={str(b)[:150]}")
                    break
        fails.append(name)

print(f"\n{len(names)-len(fails)}/{len(names)} checked queries match")
sys.exit(1 if fails else 0)
