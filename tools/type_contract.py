#!/usr/bin/env python3
"""Type-contract leg of the oracle gate (dev/spec tool, NOT library
code): compares the DuckDB LOGICAL types of each oracle query against
the DuckDB-visible types of the matching Spark output parquet — the
comparison the driver's type-sensitive hash performs implicitly.

DBAPI `.description` codes are NOT used: they collapse every integer
width into one NUMBER code, which is how a HUGEINT-vs-BIGINT oracle bug
(DuckDB promotes grouped/windowed sum(BIGINT) to HUGEINT, and the
promotion rides arithmetic like `//` downstream) shipped driver-red
twice while all value-based dev gates stayed green. `.types` gives the
binder's logical types without executing the query.

Prints ONE JSON line:
    {"checked": N, "mismatches": {name: {col: [spark, oracle]}}}
Exit 0 when the inputs were readable (the caller inspects the JSON).

Usage: type_contract.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    mismatches = {}
    checked = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            mismatches[name] = {"__spark_output__": ["missing", ""]}
            continue
        try:
            g = con.sql(f"SELECT * FROM '{files[0]}'")
            e = con.sql(sql)
            gt = dict(zip(g.columns, map(str, g.types)))
            et = dict(zip(e.columns, map(str, e.types)))
        except Exception as ex:
            mismatches[name] = {"__error__": [str(ex)[:200], ""]}
            continue
        if sorted(gt) != sorted(et):
            mismatches[name] = {
                "__columns__": [",".join(sorted(gt)), ",".join(sorted(et))]}
            continue
        diff = {c: [gt[c], et[c]] for c in sorted(gt) if gt[c] != et[c]}
        if diff:
            mismatches[name] = diff
        checked += 1
    print(json.dumps({"checked": checked, "mismatches": mismatches}))


if __name__ == "__main__":
    main()
