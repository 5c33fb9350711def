#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row-count, schema (sorted column
names) and a value hash against the Spark output parquet written by
graft.Verify. Usage: parity_check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, duckdb, math

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
try:
    verrs = json.load(open(f"{outdir}/verify_errors.json"))
except Exception:
    verrs = {}
for name, msg in verrs.items():
    print(f"FAIL {name}: verify-side error: {msg[:160]}")
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hash(tuple(out))

fails = len(verrs)
for name in sorted(oracle):
    if name in verrs:
        continue  # already counted via the verify-side error line
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    gcols = [d[0] for d in con.description]
    try:
        exp = con.execute(oracle[name]).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: schema {sorted(gcols)} vs oracle {sorted(ecols)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fails += 1; continue
    if canon(got, gcols) != canon(exp, ecols):
        print(f"FAIL {name}: value hash mismatch ({len(got)} rows)")
        gs = sorted("\x01".join(map(str, r)) for r in got)
        es = sorted("\x01".join(map(str, r)) for r in exp)
        for a, b in zip(gs, es):
            if a != b:
                print(f"  spark : {a[:200]}\n  oracle: {b[:200]}"); break
        fails += 1; continue
    print(f"OK   {name}: {len(got)} rows")
# rows-only checks for queries without oracle
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        files = glob.glob(f"{p}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{'OK  ' if n > 0 else 'WARN'} {d}: rows-only ({n} rows)")
sys.exit(1 if fails else 0)
