#!/usr/bin/env python3
"""Dev-only: diff pandas dtypes between Spark parquet output and the
DuckDB oracle result for every query in an existing verify dump.

The driver's value-hash distinguishes int64 from float64 even when the
values are numerically equal (e.g. DuckDB sum(int) → HUGEINT → float64),
so any dtype mismatch here is a latent hash_match=false.

Usage: python3 tools/dtypecheck.py [sfDir] [outDir]
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: no spark output")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: oracle error {e}")
            bad += 1
            continue
        s = {c: str(t) for c, t in spark_df.dtypes.items()}
        d = {c: str(t) for c, t in duck_df.dtypes.items()}
        diffs = [f"{c}: spark={s.get(c)} duck={d.get(c)}"
                 for c in sorted(set(s) | set(d)) if s.get(c) != d.get(c)]
        if diffs:
            bad += 1
            print(f"{name}: DTYPE MISMATCH {'; '.join(diffs)}")
    print(f"{'FAIL' if bad else 'OK'}: {bad} queries with dtype mismatches")


if __name__ == "__main__":
    main()
