"""API.md drift pin: the committed index must match a fresh render of
the live import graph, so a new/renamed public function without a doc
regen fails CI (VERDICT r4 item 7 — the parity registry must not be the
de-facto API doc)."""

from __future__ import annotations

import os
import subprocess
import sys


def test_api_md_in_sync():
    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "gen_api_doc.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_api_md_covers_operator_modules():
    """Spot-check: every operators/ and pipeline/ module with public
    functions appears as a section."""
    text = open(os.path.join(os.path.dirname(__file__), "..", "API.md")).read()
    for mod in (
        "notion_spark.operators.behavior",
        "notion_spark.operators.matview",
        "notion_spark.operators.timeseries",
        "notion_spark.pipeline.dedup",
        "notion_spark.pipeline.similarity",
        "notion_spark.pipeline.sketches",
        "notion_spark.streaming.sessions",
        "notion_spark.sources.io",
    ):
        assert f"## `{mod}`" in text, mod
