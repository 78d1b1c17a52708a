#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
       python3 tools/check_oracle.py --types <sfDir> <oracle_sql.json | verifyOutDir>

--types mode: binds every oracle SQL in DuckDB (no execution) and FAILS if
any output column is typed HUGEINT/UHUGEINT. The driver's canonicalizer
renders int128 differently from Spark's BIGINT, so a HUGEINT column
hash-mismatches even when every value is numerically equal — and the
value-compare path below (fetchall -> python int -> str) can NOT see it
(round 3 lost 8 queries this way: local PASS, driver FAIL). Run this after
any oracle SQL change. The mode self-tests first: a deliberately uncast
SUM(BIGINT) fixture must be flagged, else the guard itself is broken.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

BAD_TYPES = ("HUGEINT", "UHUGEINT")

def check_types(sfdir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    # self-test: the guard must flag an uncast integer aggregate
    fixture = con.sql("SELECT SUM(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)")
    if not any(b in str(ty).upper() for ty in fixture.types for b in BAD_TYPES):
        print("SELF-TEST FAILED: uncast SUM(BIGINT) not typed HUGEINT — guard broken")
        sys.exit(2)
    if os.path.isdir(oracle_path):
        oracle_path = os.path.join(oracle_path, "oracle_sql.json")
    oracles = json.load(open(oracle_path))
    n_bad = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        bad = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
               if any(b in str(ty).upper() for b in BAD_TYPES)]
        if bad:
            print(f"  {name}: BAD ORACLE TYPES {bad} — wrap in CAST(... AS BIGINT)")
            n_bad += 1
    print(f"TYPES {'FAIL ' + str(n_bad) if n_bad else 'OK'} ({len(oracles)} oracles)")
    sys.exit(1 if n_bad else 0)

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
    if sys.argv[1] == "--types":
        check_types(sys.argv[2], sys.argv[3])
        return
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
