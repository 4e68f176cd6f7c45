#!/usr/bin/env python
"""Fold a round's CORRECTNESS_r{N}.json keys into parity.DRIVER_CHECKED.

The driver verifies only the first 50 entries of queries();
parity.ordered_queries() rotates never-driver-checked names to the
front. Run this at the START of a round against the previous round's
artifact so the window advances:

    python scripts/update_driver_checked.py CORRECTNESS_r03.json

Idempotent: already-listed names are skipped. Prints what changed.
"""

from __future__ import annotations

import json
import re
import sys

PARITY = "notion_spark/parity.py"


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    new = list(json.load(open(sys.argv[1])))
    src = open(PARITY).read()
    m = re.search(r"DRIVER_CHECKED: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)", src, re.S)
    if not m:
        print("DRIVER_CHECKED block not found")
        return 1
    existing = set(re.findall(r'"([\w]+)"', m.group(1)))
    add = [n for n in new if n not in existing]
    if not add:
        print("nothing to add")
        return 0
    tag = sys.argv[1].replace("CORRECTNESS_", "").replace(".json", "")
    lines = [f"    # --- {tag} ({len(add)} newly driver-checked) ---"]
    for i in range(0, len(add), 4):
        lines.append("    " + " ".join(f'"{n}",' for n in add[i : i + 4]))
    block = m.group(0)[:-2] + "\n" + "\n".join(lines) + "\n)"
    open(PARITY, "w").write(src.replace(m.group(0), block))
    print(f"added {len(add)}: {add[:6]}{'...' if len(add) > 6 else ''}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
