#!/usr/bin/env python
"""Scale-slope harness: run bench.py at two sf dirs back-to-back (same
machine state, medians of N) and emit the sf_a -> sf_b slope table that
SCALE.md carries — "would this plan survive a 10x scale-up" as a number
instead of an argument.

Usage:
  python scripts/bench_scale.py [--json OUT] [sf_a sf_b [query ...]]

Defaults: sf_a=/root/testdata/sf0.1, sf_b=.localdata/sf1 (generate it
first: python scripts/gen_testdata.py 1 .localdata/sf1). With no query
names, runs the full BENCH_QUERIES set.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, queries: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), *queries],
        capture_output=True,
        text=True,
        env=env,
        cwd=ROOT,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stderr[-2000:])
        raise SystemExit(f"bench failed at {sf_dir} (rc={proc.returncode})")
    return json.loads(lines[-1])


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_a = argv[0] if argv else "/root/testdata/sf0.1"
    sf_b = argv[1] if len(argv) > 1 else os.path.join(ROOT, ".localdata/sf1")
    queries = argv[2:]
    if not os.path.isdir(sf_b):
        print(f"{sf_b} missing — generate with: python scripts/gen_testdata.py 1 {sf_b}")
        return 2

    a = run_bench(sf_a, queries)
    b = run_bench(sf_b, queries)
    print(f"| query | {os.path.basename(sf_a)} s | {os.path.basename(sf_b)} s | slope |")
    print("|---|---|---|---|")
    worst = (0.0, "")
    for name, ta in a["queries"].items():
        tb = b["queries"].get(name)
        if tb is None:
            continue
        slope = tb / ta if ta else float("inf")
        worst = max(worst, (slope, name))
        print(f"| {name} | {ta:.3f} | {tb:.3f} | {slope:.1f}x |")
    print(f"\ntotals: {a['value']:.2f}s -> {b['value']:.2f}s; worst slope {worst[0]:.1f}x ({worst[1]})")
    if json_out:
        json.dump(
            {os.path.basename(sf_a): a, os.path.basename(sf_b): b,
             "note": "back-to-back same-session runs via scripts/bench_scale.py"},
            open(json_out, "w"),
            indent=1,
        )
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
