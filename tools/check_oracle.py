#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [only]
Reads each <verifyOutDir>/<name>/ spark parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet views),
and compares: schema (sorted col names), row count, and values (cols sorted
by name, rows as emitted). Exits nonzero on any mismatch.

Optional 3rd arg: comma-separated query-name filter — a targeted
re-check (e.g. the queries whose PLANS changed this round, against an
existing Verify dump at a big SF) without paying the full sweep, which
at 10x is hours of DuckDB time in the heavy pairwise/recursive oracle
CTEs. Per-query lines flush immediately so a long sweep shows progress."""
import sys, json, glob, os, math
import duckdb, pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
if only is not None:
    # A mistyped filter must not silently compare zero queries and pass.
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: filter names not in oracle_sql.json: {sorted(unknown)}")
        sys.exit(2)
fail = 0
compared = 0
def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        spark_tbl = pq.read_table(d)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fail += 1; continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
    scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if scols != dcols:
        print(f"FAIL {name}: columns {scols} != {dcols}"); fail += 1; continue
    if spark_tbl.num_rows != duck.num_rows:
        print(f"FAIL {name}: rows {spark_tbl.num_rows} != {duck.num_rows}"); fail += 1; continue
    srows = [tuple(norm(r[c]) for c in scols) for r in spark_tbl.to_pylist()]
    drows = [tuple(norm(r[c]) for c in dcols) for r in duck.to_pylist()]
    if srows != drows:
        # ordering differences FAIL too: the driver's compare is an exact
        # hash match, so "equal after sort" would still fail the round
        if sorted(map(repr, srows)) == sorted(map(repr, drows)):
            print(f"FAIL {name}: values match only after row sort (ordering differs)")
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"  first order diff at row {i}: spark={a} duck={b}"); break
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
        fail += 1; continue
    print(f"OK   {name} ({spark_tbl.num_rows} rows)", flush=True)
    compared += 1
if compared == 0 and fail == 0:
    print("FAIL: 0 queries compared"); sys.exit(2)
print(f"ALL OK ({compared} compared)" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
