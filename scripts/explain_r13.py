#!/usr/bin/env python
"""Capture .explain("formatted") for named parity queries into
plans/r13/<query>_<tag>.txt (the optimization round's evidence files).

Usage: python scripts/explain_r13.py <tag> <query> [query ...]
  tag is "before" or "after".

Runs on sf0.1 (the bench SF) unless SPARK_GRAFT_SF_DIR overrides.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from notion_spark import parity
    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark

    spark = get_spark(
        app_name="explain-r13",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = parity.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
