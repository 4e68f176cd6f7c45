#!/usr/bin/env python
"""One-shot: render SCALE_r08_slopes.json as the SCALE.md r8 table.
Deleted after use (round-8 working script, not product surface)."""
import json
import sys

d = json.load(open("SCALE_r08_slopes.json"))
a, b = d["sf0.1"]["queries"], d["sf1"]["queries"]
rows = []
for name, ta in a.items():
    tb = b.get(name)
    if tb is None:
        continue
    rows.append((name, ta, tb, tb / ta if ta else float("inf")))
rows.sort(key=lambda r: -r[3])
print("| query | sf0.1 s | sf1 s | slope |")
print("|---|---|---|---|")
for name, ta, tb, sl in rows:
    print(f"| {name} | {ta:.2f} | {tb:.2f} | {sl:.1f}x |")
