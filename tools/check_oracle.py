#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev-only, not shipped
to the Spark code): run `sbt "runMain graft.Verify <sfDir> <outDir>"` first,
then this script compares each query's parquet dump against DuckDB running
the oracle SQL over the same testdata tables.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        return str(round(v, 9))
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue

        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns differ: spark={gcols} oracle={wcols}")
            n_fail += 1
            continue
        got, want = got[gcols], want[wcols]
        if len(got) != len(want):
            print(f"FAIL {name}: rows differ: spark={len(got)} oracle={len(want)}")
            n_fail += 1
            continue

        g = sorted([tuple(norm(v) for v in row) for row in got.itertuples(index=False)])
        w = sorted([tuple(norm(v) for v in row) for row in want.itertuples(index=False)])
        if g != w:
            bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1

    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
