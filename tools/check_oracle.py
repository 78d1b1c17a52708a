#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output) and runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet,
then compares row count, schema (column names) and values (columns sorted
by name, exact equality after canonicalization).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        sp = con.execute(f"SELECT * FROM '{files[0]}'")
        sp_cols = [d[0] for d in sp.description]
        sp_rows = sp.fetchall()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sp_rows)} rows) {'OK' if len(sp_rows)>0 else 'EMPTY!'}")
            continue
        try:
            du = con.execute(oracles[name])
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        du_cols = [d[0] for d in du.description]
        du_rows = du.fetchall()
        if sorted(sp_cols) != sorted(du_cols):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1; continue
        if len(sp_rows) != len(du_rows):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(sp_rows)} duck={len(du_rows)}")
            n_fail += 1; continue
        a, b = canon(sp_rows, sp_cols), canon(du_rows, du_cols)
        if a != b:
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"  {name}: VALUE MISMATCH ({len([1 for x,y in zip(a,b) if x!=y])}/{len(a)} rows) e.g. {bad}")
            n_fail += 1; continue
        print(f"  {name}: OK ({len(sp_rows)} rows)")
        n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
