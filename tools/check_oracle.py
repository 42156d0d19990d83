#!/usr/bin/env python3
"""Dev-only oracle pre-checker (mimics the driver's t2 gate).

Runs each oracle_sql.json entry in DuckDB against the fixture parquet
tables, loads the corresponding Spark result parquet, sorts columns by
name and rows by all values, and compares cell-by-cell (bit-exact,
like a hash compare would). Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir>

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
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{files[0]}'").fetchall()
            gcols = [d[0] for d in con.sql(f"SELECT * FROM '{files[0]}'").description]
            exp = con.sql(oracle[name]).fetchall()
            ecols = [d[0] for d in con.sql(oracle[name]).description]
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"SCHEMA   {name}: spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_bad += 1; continue
        # Type check: the driver's hash is type-sensitive (HUGEINT vs BIGINT
        # was r1's only red class), so compare DuckDB-visible column types too.
        gtypes = dict(zip(gcols, [str(d[1]) for d in con.sql(f"SELECT * FROM '{files[0]}'").description]))
        etypes = dict(zip(ecols, [str(d[1]) for d in con.sql(oracle[name]).description]))
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
