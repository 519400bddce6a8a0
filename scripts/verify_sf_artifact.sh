#!/usr/bin/env bash
# Run the sf0.1 oracle differential and emit a committed JSON artifact
# (r16 verdict item 5: the larger-scale differential ran every round but
# left no auditable record — CORRECTNESS_r*.json is the driver's sf0.01
# gate). Usage: scripts/verify_sf_artifact.sh OUT_JSON [SF_DIR]
set -euo pipefail
OUT_JSON=${1:?usage: verify_sf_artifact.sh OUT_JSON [SF_DIR]}
SF_DIR=${2:-/root/testdata/sf0.1}
cd "$(dirname "$0")/.."
TMP_OUT=$(mktemp -d /tmp/verify_sf_art.XXXX)
LOG=$(mktemp /tmp/verify_sf_art_log.XXXX)
scripts/verify_sf.sh "$SF_DIR" "$TMP_OUT" | tee "$LOG"
python3 - "$LOG" "$OUT_JSON" "$SF_DIR" <<'EOF'
import json, re, sys, datetime
log, out, sf = sys.argv[1], sys.argv[2], sys.argv[3]
txt = open(log).read()
oks = re.findall(r"^ok   (\S+)$", txt, re.M)
fails = re.findall(r"^FAIL (\S+)(.*)$", txt, re.M)
m = re.search(r"^(\d+)/(\d+) pass$", txt, re.M)
doc = {
    "sf_dir": sf,
    "when": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    "n_pass": int(m.group(1)) if m else len(oks),
    "n_total": int(m.group(2)) if m else len(oks) + len(fails),
    "failures": [{"query": q, "detail": d.strip()} for q, d in fails],
    "queries_pass": sorted(oks),
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {doc['n_pass']}/{doc['n_total']} pass")
EOF
