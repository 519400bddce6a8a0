#!/usr/bin/env python3
"""Validate BASELINE.md's calibration-normalization rule on a bench run
(r13 verdict item 7; parallelism-keyed floors r14 verdict item 4):
divide each per-query time by the run's machine-day factor
(median(calib_start, calib_end) / calib_floor), ratio against the
SAME-PARALLELISM floor column (floor4 for a local[4] run, floor32 for a
local[32] run — read from the bench JSON's "cpus" field; cells missing
a same-parallelism floor fall back to the all-runs baseline MIN), and
print the per-decile distribution. If the median normalized ratio sits
near 1, the probe explains the machine-day drift; a fat upper tail
names real regressions. With same-parallelism floors the old prose
adjudication for the mixed-keyed cells (q68, q92, q93, q54) is gone —
a >2x cell is a finding, not a parallelism artifact.

Usage: calib_validate.py BENCH_JSON [CALIB_FLOOR]
       (default calib floor by cpus: 1.228 at 4, 0.81 at 32)
"""
import json
import re
import statistics
import sys

bench = json.load(open(sys.argv[1]))
cpus = int(bench.get("cpus") or 4)
default_calib = {4: 1.228, 32: 0.81}.get(cpus, 0.81)
floor_calib = float(sys.argv[2]) if len(sys.argv) > 2 else default_calib

# Parse the floor table: header names the columns; take the
# same-parallelism floor (floor4/floor32), falling back to baseline.
floors = {}
floor_col = "floor4" if cpus <= 4 else "floor32"
cols = None
for ln in open("BASELINE.md"):
    if ln.startswith("| # | query |"):
        cols = [c.strip() for c in ln.strip().strip("|").split("|")]
        continue
    m = re.match(r"\|\s*\d+\s*\|\s*(q\S+)\s*\|(.*)\|\s*$", ln)
    if m and cols:
        cells = [c.strip() for c in m.group(2).split("|")]
        row = dict(zip(cols[2:], cells))
        # same-parallelism floor first; a MISSING OR NON-NUMERIC cell
        # ('', '-', 'n/a' ...) falls back to the all-runs baseline MIN
        # instead of silently dropping the query (ADVICE r15)
        for v in (row.get(floor_col, ""), row.get("baseline", "")):
            try:
                floors[m.group(1)] = float(v)
                break
            except ValueError:
                continue

calib = statistics.median(
    [bench["calib_start_sec"], bench["calib_end_sec"]])
day = calib / floor_calib
print(f"cpus={cpus} floor_col={floor_col} calib median {calib:.3f}s, "
      f"calib floor {floor_calib}, day factor {day:.3f}")

ratios = []
for q, t in bench["queries"].items():
    if q in floors and floors[q] > 0:
        ratios.append((t / day / floors[q], q, t))
ratios.sort()
n = len(ratios)
print(f"{n} queries with floors; normalized ratio deciles:")
print("| decile | ratio | query at decile |")
print("|---|---|---|")
for d in range(11):
    i = min(n - 1, (n - 1) * d // 10)
    r, q, t = ratios[i]
    print(f"| p{d*10} | {r:.2f} | {q} ({t:.2f}s raw) |")
med = statistics.median([r for r, _, _ in ratios])
over2 = [(q, round(r, 2)) for r, q, _ in ratios if r > 2]
print(f"\nmedian normalized ratio: {med:.3f}")
print(f">2x floor after normalization: {len(over2)} {over2}")
