#!/usr/bin/env python
"""Fold a round's CORRECTNESS_r{N}.json keys into parity.DRIVER_CHECKED.

The driver verifies only the first 50 entries of queries();
parity.ordered_queries() rotates never-driver-checked names to the
front and orders the rest least-recently-checked first. Run this at the
START of a round against the previous round's artifact so the window
advances:

    python scripts/update_driver_checked.py CORRECTNESS_r03.json

Only VERIFIED rows fold: a row with a non-null err, or rows_match /
schema_match / hash_match explicitly false, is NOT driver-checked — it
is kept OUT of DRIVER_CHECKED so it sits in the fresh prefix and the
driver re-verifies it after the fix (r3 lesson: folding failures would
rotate them out of the window and the fix would never get a driver
row). That includes DEMOTING a previously-folded name that regressed in
this artifact: it is removed from the tuple entirely, returning it to
the fresh prefix immediately rather than waiting for LRU rotation.
Rows-only rows (hash_match null with no error) fold — that is the
strongest signal they can ever get.

Re-verified names MOVE to the end of the tuple, so the tuple's order is
true least-recently-checked order and the 50-query window cycles the
whole registry instead of pinning to the first 50 registrations.

Idempotent: re-running with the same artifact leaves the same order.
Prints what changed.
"""

from __future__ import annotations

import json
import re
import sys

# r11: the registry split into a package; the rotation state lives in
# the _window module now
PARITY = "notion_spark/parity/_window.py"


def green(row: dict) -> bool:
    if row.get("err"):
        return False
    return not any(
        row.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    )


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    data = json.load(open(sys.argv[1]))
    ok = [n for n, row in data.items() if green(row)]
    skipped = [n for n in data if n not in ok]
    if skipped:
        print(f"skipping {len(skipped)} unverified (stay fresh): {skipped}")

    src = open(PARITY).read()
    m = re.search(r"DRIVER_CHECKED: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)", src, re.S)
    if not m:
        print("DRIVER_CHECKED block not found")
        return 1
    body = m.group(1)
    okset = set(ok)
    failset = set(skipped)
    original = set(re.findall(r'"([\w]+)"', body))
    demoted = sorted(original & failset)
    if demoted:
        print(f"demoting {len(demoted)} regressed names to the fresh prefix: {demoted}")
    # Drop re-checked names from their old positions (they move to the
    # end = most recently checked) AND drop regressed names entirely
    # (back to fresh); keep comments, drop emptied lines.
    kept_lines = []
    for line in body.split("\n"):
        if line.strip().startswith("#"):
            kept_lines.append(line)
            continue
        names = [
            n
            for n in re.findall(r'"([\w]+)"', line)
            if n not in okset and n not in failset
        ]
        if names:
            kept_lines.append("    " + " ".join(f'"{n}",' for n in names))
    existing = set(re.findall(r'"([\w]+)"', "\n".join(kept_lines)))
    add = [n for n in ok if n not in existing]
    if not add and not demoted:
        print("nothing to add")
        return 0
    if add:
        tag = sys.argv[1].replace("CORRECTNESS_", "").replace(".json", "")
        header = f"    # --- {tag} ({len(add)} driver-checked this round) ---"
        # re-runs orphan the previous identical tag comment — drop it
        kept_lines = [ln for ln in kept_lines if ln != header]
        kept_lines.append(header)
        for i in range(0, len(add), 4):
            kept_lines.append("    " + " ".join(f'"{n}",' for n in add[i : i + 4]))
    block = "DRIVER_CHECKED: tuple[str, ...] = (\n" + "\n".join(kept_lines) + "\n)"
    src = src.replace(m.group(0), block)
    # Clear re-certification debt: a green driver row for a name listed
    # in PLAN_RECERT certifies its NEW plan, so drop it from the tuple
    # (r10 mechanism — see parity.PLAN_RECERT).
    mr = re.search(r"PLAN_RECERT: tuple\[str, \.\.\.\] = \(\n(.*?)\n\)", src, re.S)
    if mr:
        rbody = mr.group(1)
        recert_names = re.findall(r'"([\w]+)"', rbody)
        cleared = [n for n in recert_names if n in okset]
        if cleared:
            rlines = []
            for line in rbody.split("\n"):
                if line.strip().startswith("#"):
                    rlines.append(line)
                    continue
                names = [
                    n for n in re.findall(r'"([\w]+)"', line) if n not in okset
                ]
                if names:
                    rlines.append("    " + " ".join(f'"{n}",' for n in names))
            rblock = (
                "PLAN_RECERT: tuple[str, ...] = (\n" + "\n".join(rlines) + "\n)"
            )
            src = src.replace(mr.group(0), rblock)
            print(f"cleared {len(cleared)} re-certified plan swaps: {cleared}")
    open(PARITY, "w").write(src)
    moved = len([n for n in add if n in original])
    print(f"folded {len(add)} ({moved} re-checked names moved to tail): {add[:6]}{'...' if len(add) > 6 else ''}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
