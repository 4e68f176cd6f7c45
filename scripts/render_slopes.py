#!/usr/bin/env python
"""Render a SCALE_r{N}_slopes.json (two bench runs at different SFs,
as written by scripts/bench_scale.py) as the SCALE.md markdown slope
table, sorted worst-slope-first.

Usage: python scripts/render_slopes.py SCALE_r09_slopes.json [key_a key_b]

key_a/key_b default to "sf0.1" / "sf1" — pass them explicitly when the
artifact compares a different SF pair (e.g. sf1 sf10).
"""
import json
import sys


def main(argv: list[str]) -> None:
    if not argv:
        sys.exit("usage: render_slopes.py SLOPES.json [key_a key_b]")
    d = json.load(open(argv[0]))
    ka = argv[1] if len(argv) > 1 else "sf0.1"
    kb = argv[2] if len(argv) > 2 else "sf1"
    a, b = d[ka]["queries"], d[kb]["queries"]
    rows = []
    for name, ta in a.items():
        tb = b.get(name)
        if tb is None:
            continue
        rows.append((name, ta, tb, tb / ta if ta else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {ka} s | {kb} s | slope |")
    print("|---|---|---|---|")
    for name, ta, tb, sl in rows:
        print(f"| {name} | {ta:.2f} | {tb:.2f} | {sl:.1f}x |")


if __name__ == "__main__":
    main(sys.argv[1:])
