#!/usr/bin/env python3
"""Summarize a StreamSoak log's [delta-compact] fold curve: per cadence
point the published tier span, fold wall seconds, and the concurrent
load annotation from the nearest [stream-soak] line — the evidence rows
SURVEY's compaction tables quote.

Caveats (ADVICE r13):
  - the "load before" column attaches the most recent PRECEDING
    [stream-soak] status line's load, which can be up to a full status
    cadence (hundreds of batches) earlier than the fold it annotates —
    read it as ambient context, not a per-fold measurement;
  - a crash-resumed soak can re-publish the same tier name (the
    publisher adopts a crashed predecessor's markered fold); duplicate
    tier names are deduped here (first occurrence wins) so the totals
    count each logical fold once.

Usage: fold_curve.py LOGFILE [every_nth]
"""
import re
import sys

path = sys.argv[1]
nth = int(sys.argv[2]) if len(sys.argv) > 2 else 1
pubs = []
seen_tiers = set()
last_load = None
for ln in open(path):
    m = re.search(r"\[stream-soak\].*batch=\s*(\d+).*trigger_ms=(\d+)\s+.*load=([\d.]+)", ln)
    if m:
        last_load = float(m.group(3))
    p = re.search(r"\[delta-compact\] published (t(\d+)_(\d+)) span=(\d+) wall=([\d.]+)s", ln)
    if p:
        name = p.group(1)
        if name in seen_tiers:
            continue
        seen_tiers.add(name)
        lo, hi = int(p.group(2)), int(p.group(3))
        pubs.append((hi, hi - lo + 1, float(p.group(5)), last_load))
if not pubs:
    sys.exit("no [delta-compact] lines (need -Dgraft.delta.verbose=true)")
print("| fold point (hi) | span | wall s | load before |")
print("|---|---|---|---|")
for i, (hi, span, wall, load) in enumerate(pubs):
    if i % nth == 0 or span > 400 or i >= len(pubs) - 3:
        print(f"| {hi} | {span} | {wall:.1f} | {load if load is not None else '—'} |")
tot = sum(p[2] for p in pubs)
small = [p for p in pubs if p[1] <= 400]
big = [p for p in pubs if p[1] > 400]
print(f"\npublishes: {len(pubs)}, total fold wall {tot:.0f}s")
if small:
    import statistics
    print(f"span<=400 folds: n={len(small)}, wall min/med/max = "
          f"{min(p[2] for p in small):.1f}/"
          f"{statistics.median([p[2] for p in small]):.1f}/"
          f"{max(p[2] for p in small):.1f}s")
if big:
    print("carries (span>400): " + ", ".join(
        f"{p[0]}:span{p[1]}={p[2]:.1f}s" for p in big))
