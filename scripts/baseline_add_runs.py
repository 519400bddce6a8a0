#!/usr/bin/env python3
"""Fold one or more bench_out.json runs into BASELINE.md's per-query
regression table: append one column per run and recompute the
`baseline` (min) column, honouring the implementation-keyed floor rule
(superseded entries marked with a dagger are excluded from the min).

Usage: baseline_add_runs.py LABEL:bench.json [LABEL:bench.json ...]
Prints the new table to stdout; splice it in manually (the surrounding
prose needs a human sentence per refresh anyway).
"""
import json, re, sys

runs = []
for arg in sys.argv[1:]:
    label, path = arg.split(":", 1)
    with open(path) as f:
        runs.append((label, json.load(f)["queries"]))

text = open("BASELINE.md").read()
rows = re.findall(r"^\| (\d+) \| (q\S+) \| (.*) \|$", text, re.M)
for idx, name, rest in rows:
    cells = [c.strip() for c in rest.split("|")]
    old_cols, old_base = cells[:-1], cells[-1]
    vals = []
    for c in old_cols:
        c2 = c.rstrip("†").strip()
        if c2 not in ("—", "") and not c.endswith("†"):
            try:
                vals.append(float(c2))
            except ValueError:
                pass
    new_cells = []
    for label, q in runs:
        v = q.get(name)
        new_cells.append("—" if v is None else f"{v:.2f}")
        if v is not None:
            vals.append(v)
    base = f"{min(vals):.2f}" if vals else "—"
    print(f"| {idx} | {name} | " + " | ".join(old_cols + new_cells) +
          f" | {base} |")
