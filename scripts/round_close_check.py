#!/usr/bin/env python
"""Round-close gate: run BEFORE the end-of-round snapshot commit.

Exists because the last substantive commit of a round broke the suite
three rounds in a row without anyone re-running it: r8's final commit
broke tests/test_api_doc.py (doc drift), r9's final commit broke
tests/test_plans.py (the max_candidates guard added a 1-row
BroadcastNestedLoopJoin that the round's own plan pin rejects), and
r11's final EXAMPLES.md commit broke tests/test_examples_doc.py
(multi-line imports vs the lint's line parser). The gate now runs every
doc/contract suite — the exact class a late doc/registration commit
breaks: physical-plan shape, the generated API doc, the EXAMPLES.md
lint, and the parity/driver-entry contracts. All are fast (~2 min).

Usage (the round ritual, see BASELINE.md):

    python scripts/round_close_check.py          # the two hot suites
    python scripts/round_close_check.py --full   # the whole test tree

Exit code is pytest's — non-zero means DO NOT snapshot; fix first.
"""

from __future__ import annotations

import subprocess
import sys

HOT_SUITES = [
    "tests/test_plans.py",
    "tests/test_api_doc.py",
    "tests/test_examples_doc.py",
    "tests/test_parity_contract.py",  # includes the driver-entry contract
]


def main() -> int:
    args = sys.argv[1:]
    target = ["tests/"] if "--full" in args else HOT_SUITES
    cmd = [sys.executable, "-m", "pytest", *target, "-q"]
    print("round-close gate:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd)
    if rc != 0:
        print(
            "\nround-close gate FAILED — do not snapshot; the last commit"
            " broke a pinned surface (plan shape or API doc). Fix and"
            " re-run.",
            file=sys.stderr,
        )
    else:
        print("round-close gate OK — safe to snapshot.")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
