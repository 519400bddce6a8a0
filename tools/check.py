#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name, and compares values.
"""
import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import attest  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.reset_index(drop=True)
    return df


def cmp_frames(a, b):
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"rowcount differs: spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            return (f"dtype differs on {col}: spark={a[col].dtype} "
                    f"oracle={b[col].dtype}")
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (x == y)
            if not same and isinstance(x, float) and isinstance(y, float):
                same = (math.isnan(x) and math.isnan(y)) or x == y
            if not same:
                return f"col {col} row {i}: spark={x!r} oracle={y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    attest.assert_utc_session(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            err = cmp_frames(got, want)
        except Exception as e:  # noqa: BLE001
            err = f"exception: {e}"
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"ok   {name}")
    print(f"{n_ok}/{len(oracles)} pass")
    sys.exit(0 if n_ok == len(oracles) else 1)


if __name__ == "__main__":
    main()
