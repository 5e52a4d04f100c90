#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run DuckDB oracle SQL from
oracle_sql.json over the sf parquet tables and compare to the Verify
parquet dumps (column-name-sorted, row-sorted, exact value match)."""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1; continue
        exp = exp.sort_values(list(exp.columns), ignore_index=True)
        got = got.sort_values(list(got.columns), ignore_index=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1; continue
        if not exp.equals(got):
            neq = (exp != got) & ~(exp.isna() & got.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first:")
            print("  exp:", exp[bad].head(2).to_dict("records"))
            print("  got:", got[bad].head(2).to_dict("records"))
            fails += 1; continue
        print(f"PASS {name} ({len(exp)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1
sys.exit(1 if fails else 0)
