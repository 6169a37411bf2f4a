#!/usr/bin/env python3
"""Dump checker-normalized Spark row hashes for a Verify output dir.

Usage: spark_hashes.py OUT_DIR [OUT.json]
Same normalization as check_oracle.py's norm() so the hashes are
directly comparable to HASHES_r*.json artifacts.
"""
import sys, json, glob
import hashlib
import pandas as pd

out_dir = sys.argv[1]
dest = sys.argv[2] if len(sys.argv) > 2 else None

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
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(df)

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
result = {}
for name in sorted(oracles):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        result[name] = {"hash": "MISSING", "rows": 0}
        continue
    df = pd.concat([pd.read_parquet(f) for f in files])
    h, n = norm(df)
    result[name] = {"hash": h, "rows": n}

text = "{" + ",\n".join(
    f'"{k}": {json.dumps(v)}' for k, v in result.items()) + "}\n"
if dest:
    open(dest, "w").write(text)
else:
    sys.stdout.write(text)
