"""Session-attestation gate shared by the two DuckDB oracle checkers
(tools/check.py and scripts/local_oracle_check.py) — ONE definition so
the contract cannot drift between them.

Timestamp comparison against DuckDB is sound only when the dumping
Spark session ran in UTC (TIMESTAMP_NTZ fixtures read back naive; a
non-UTC session would shift session-typed timestamps by a constant
offset the comparison cannot see). graft.Verify attests its timezone
in <outdir>/session_conf.json; this asserts it rather than assuming.
"""
import json
import sys


def assert_utc_session(outdir):
    try:
        conf = json.load(open(f"{outdir}/session_conf.json"))
    except FileNotFoundError:
        sys.exit(f"{outdir}/session_conf.json missing - re-run graft.Verify "
                 "(the dump must attest its session timezone)")
    tz = conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        sys.exit(f"dump written under session timeZone={tz!r}, not UTC - "
                 "timestamp comparison would be unsound; re-dump with a "
                 "UTC session")
