#!/usr/bin/env bash
# One-command oracle differential at an arbitrary scale factor:
# dump every catalog query with graft.Verify, then compare each against
# its DuckDB oracle with tools/check.py — the same gate the driver runs
# at sf0.01, runnable on demand at sf0.1 (or any fixture dir) so the
# larger-SF differential is a script target, not a hand-ritual.
#
#   scripts/verify_sf.sh [SF_DIR] [OUT_DIR] [q1,q2,...]
#
# Defaults: SF_DIR=/root/testdata/sf0.1, OUT_DIR=/tmp/verify_<sfname>.
# The optional third arg restricts to a comma-separated query list.
set -euo pipefail
# Resolve paths BEFORE the cd to the repo root, or caller-relative
# paths would silently re-resolve against the repo (worst case: a
# stale same-named fixture dir under the repo root verifies the wrong
# corpus). sbt's runMain splits its argument string on whitespace, so
# paths with spaces cannot be passed through it — reject them loudly.
SF_DIR=$(realpath "${1:-/root/testdata/sf0.1}")
OUT_DIR=${2:-/tmp/verify_$(basename "$SF_DIR")}
mkdir -p "$OUT_DIR"
OUT_DIR=$(realpath "$OUT_DIR")
ONLY=${3:-}
case "$SF_DIR$OUT_DIR$ONLY" in (*[[:space:]]*)
  echo "verify_sf.sh: paths/query lists must not contain whitespace" >&2
  exit 2 ;;
esac
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR $ONLY"
python3 tools/check.py "$SF_DIR" "$OUT_DIR"
