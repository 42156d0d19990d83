#!/usr/bin/env python3
"""Dev-only oracle pre-checker (mimics the driver's t2 gate).

Runs each oracle_sql.json entry in DuckDB against the fixture parquet
tables, loads the corresponding Spark result parquet, sorts columns by
name and rows by all values, and compares cell-by-cell (bit-exact,
like a hash compare would). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [prefix,prefix,...]

NOT part of the Spark library — python/duckdb are driver-side tools.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else [""]
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if not any(name.startswith(p) for p in prefixes):
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            grel = con.sql(f"SELECT * FROM '{files[0]}'")
            erel = con.sql(oracle[name])
            gcols = list(grel.columns)
            ecols = list(erel.columns)
            # LOGICAL types (BIGINT vs HUGEINT vs INTEGER), not DBAPI
            # .description codes — those collapse every integer width
            # into the same NUMBER code, which is exactly the class the
            # driver's type-sensitive hash punishes (ta39/ta40 in r11/r12:
            # windowed/grouped sum(BIGINT) promotes to HUGEINT in DuckDB
            # and the promotion rides arithmetic like `//` downstream).
            gtypes = dict(zip(gcols, [str(t) for t in grel.types]))
            etypes = dict(zip(ecols, [str(t) for t in erel.types]))
            got = grel.fetchall()
            exp = erel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"SCHEMA   {name}: spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_bad += 1; continue
        tdiff = {c: (gtypes[c], etypes[c]) for c in gtypes if gtypes[c] != etypes[c]}
        if tdiff:
            print(f"TYPES    {name}: {tdiff}"); n_bad += 1; continue
        gi = [gcols.index(c) for c in sorted(gcols)]
        ei = [ecols.index(c) for c in sorted(ecols)]
        key = lambda row: tuple((c is None, str(c)) for c in row)
        g = sorted((tuple(norm(r[i]) for i in gi) for r in got), key=key)
        e = sorted((tuple(norm(r[i]) for i in ei) for r in exp), key=key)
        if len(g) != len(e):
            print(f"ROWS     {name}: spark={len(g)} oracle={len(e)}"); n_bad += 1; continue
        diff = [(a, b) for a, b in zip(g, e) if a != b]
        if diff:
            print(f"VALUES   {name}: {len(diff)}/{len(g)} rows differ; first: spark={diff[0][0]} oracle={diff[0][1]}")
            n_bad += 1; continue
        print(f"OK       {name} ({len(g)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
