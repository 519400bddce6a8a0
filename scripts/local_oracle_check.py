#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/local_oracle_check.py OUTDIR SFDIR [q1,q2,...]

Reads OUTDIR/<query>/ parquet dumps (written by graft.Verify) and
OUTDIR/oracle_sql.json, runs each oracle against the SFDIR parquet
tables in DuckDB, and compares: row count, column names (sorted), and
values (floats rounded to 6 decimals). Exit 1 on any mismatch.
"""
import glob
import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir, "tools"))
import attest  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        # normalize tz-awareness: a Spark TimestampType dump reads back
        # tz-aware (UTC) while DuckDB oracle SQL yields naive values —
        # compare both as naive UTC. SOUND ONLY under a UTC session —
        # which main() ASSERTS from the dump's session_conf.json before
        # any comparison runs (a non-UTC session would let a
        # constant-offset mismatch hide behind this normalization).
        if getattr(v, "tzinfo", None) is not None:
            from datetime import timezone
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(canon(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], sorted(data, key=lambda t: tuple(map(str, t)))


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    # The canon() timestamp normalization (strip tzinfo after converting
    # to UTC) is sound only when the DUMPING session ran in UTC —
    # asserted by the shared gate (tools/attest.py).
    attest.assert_utc_session(outdir)
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    failed = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            failed.append((name, "no spark dump"))
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet({files!r})")
            ocols, orows = rows_of(con, sql)
        except Exception as e:
            failed.append((name, f"error: {e}"))
            continue
        if scols != ocols:
            failed.append((name, f"cols spark={scols} oracle={ocols}"))
        elif len(srows) != len(orows):
            failed.append((name, f"rows spark={len(srows)} oracle={len(orows)}"))
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            failed.append((name, f"value diff at sorted row {bad}: "
                                 f"spark={srows[bad]} oracle={orows[bad]}"))
        else:
            print(f"  ok   {name} ({len(srows)} rows)")
    for name, why in failed:
        print(f"  FAIL {name}: {why}")
    print(f"{len(failed)} failures")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
