#!/usr/bin/env python3
"""Local mimic of the driver's correctness compare.

Usage: compare.py SF_DIR OUT_DIR [query ...]
Reads OUT_DIR/<q>/ (spark parquet) and OUT_DIR/oracle_sql.json, runs each
oracle in duckdb over SF_DIR tables, compares rows/schema/hash.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for r in df.itertuples(index=False):
        cells = []
        for v in r:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{v:.10g}")
            else:
                cells.append(str(v).replace(" 00:00:00", ""))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(df), sorted(df.columns)

fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output")
        fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        ora_df = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERR {e}")
        fail += 1
        continue
    sh, sn, sc = norm(spark_df)
    oh, on, oc = norm(ora_df)
    ok = (sh == oh) and (sn == on) and (sc == oc)
    if not ok:
        fail += 1
        print(f"{name}: rows {sn} vs {on}, schema {'OK' if sc == oc else f'{sc} vs {oc}'}, hash {'OK' if sh == oh else 'MISMATCH'}")
    else:
        print(f"{name}: OK ({sn} rows)")
sys.exit(1 if fail else 0)
