#!/usr/bin/env python3
"""Flatten a MakeScaled output dir (Spark part-file directories) into the
single-file-per-table layout the testdata uses, so graft.Verify,
tools/check_oracle.py and graft.Bench run against it unchanged.

events.ts round-trip: MakeScaled writes ts as raw INT64 nanos (the
legacy-conf read of the TIMESTAMP(NANOS) source); restore a timestamp
column at microsecond grain (`ts // 1000`, exactly the truncation
graft.table applies) typed TIMESTAMP_NS to match the source spelling.

Driver-side tooling only (duckdb/pyarrow are the harness's, not the
library's, dependencies)."""
import duckdb
import glob
import os
import sys


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    tables = sorted(os.path.basename(p)[: -len(".parquet")]
                    for p in glob.glob(f"{src}/*.parquet"))
    for t in tables:
        sel = f"SELECT * FROM read_parquet('{src}/{t}.parquet/*.parquet')"
        if t == "events":
            # MakeScaled historically wrote ts as raw INT64 nanos (legacy
            # nanos read); since graft.table normalizes writer spellings it
            # emits a real timestamp — branch on the actual type
            desc = con.execute(
                "DESCRIBE SELECT * FROM read_parquet("
                f"'{src}/{t}.parquet/*.parquet')").fetchall()
            ts_type = next(row[1] for row in desc if row[0] == "ts")
            repl = ("CAST(make_timestamp(ts // 1000) AS TIMESTAMP_NS)"
                    if ts_type == "BIGINT"
                    else "CAST(ts AS TIMESTAMP_NS)")
            sel = (f"SELECT * REPLACE ({repl} AS ts) "
                   f"FROM read_parquet('{src}/{t}.parquet/*.parquet')")
        con.execute(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"flat {t}: {n} rows")


if __name__ == "__main__":
    main()
