#!/usr/bin/env python3
"""Validate BASELINE.md's calibration-normalization rule on a bench run
(r13 verdict item 7): divide each per-query time by the run's machine-day
factor (median(calib_start, calib_end) / calib_floor), ratio against the
BASELINE floor column, and print the per-decile distribution. If the
median normalized ratio sits near 1, the probe explains the machine-day
drift; a fat upper tail names real regressions (or harness adjacency —
see BASELINE.md's q93 note on post-probe JIT recovery and parallelism).

Usage: calib_validate.py BENCH_JSON [CALIB_FLOOR]
       (default floor 0.81 = the local[32] calib floor; pass 1.228 for
        a local[4] run — check the run's "cpus" field)
"""
import json
import re
import statistics
import sys

bench = json.load(open(sys.argv[1]))
floor_calib = float(sys.argv[2]) if len(sys.argv) > 2 else 0.81

floors = {}
for ln in open("BASELINE.md"):
    m = re.match(r"\|\s*\d+\s*\|\s*(q\S+)\s*\|.*\|\s*([\d.]+)\s*\|\s*$", ln)
    if m:
        floors[m.group(1)] = float(m.group(2))

calib = statistics.median(
    [bench["calib_start_sec"], bench["calib_end_sec"]])
day = calib / floor_calib
print(f"cpus={bench.get('cpus', '?')} calib median {calib:.3f}s, "
      f"floor {floor_calib}, day factor {day:.3f}")

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
