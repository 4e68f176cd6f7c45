"""EXAMPLES.md drift guard: every import statement and module-attribute
reference in the cookbook must exist in the codebase, so the documented
API can never silently rot (the cookbook was hand-verified once; this
keeps it true)."""

from __future__ import annotations

import importlib
import re
from pathlib import Path

EXAMPLES = (Path(__file__).resolve().parents[1] / "EXAMPLES.md").read_text()


def _code_blocks() -> list[str]:
    return re.findall(r"```python\n(.*?)```", EXAMPLES, re.S)


def _logical_lines(block: str) -> list[str]:
    """Join parenthesized multi-line statements (PEP-8 import style) into
    one logical line so `from m import (\n  a, b)` parses like `from m
    import a, b`."""
    out: list[str] = []
    buf = ""
    for raw in block.splitlines():
        ln = raw.strip()
        if buf:
            buf += " " + ln
            if buf.count("(") <= buf.count(")"):
                out.append(buf.replace("(", "").replace(")", "").strip().rstrip(","))
                buf = ""
            continue
        if ln.startswith(("from ", "import ")) and ln.count("(") > ln.count(")"):
            buf = ln
        else:
            out.append(ln)
    if buf:
        out.append(buf.replace("(", "").replace(")", "").strip().rstrip(","))
    return out


def test_every_import_line_resolves():
    lines = [
        ln
        for block in _code_blocks()
        for ln in _logical_lines(block)
        if ln.startswith(("from notion_spark", "import notion_spark"))
    ]
    assert lines, "no notion_spark imports found in EXAMPLES.md"
    for ln in lines:
        m = re.match(r"from (\S+) import (.+)", ln)
        if m:
            mod = importlib.import_module(m.group(1))
            for name in re.split(r",\s*", m.group(2)):
                name = name.split(" as ")[0].strip()
                if hasattr(mod, name):
                    continue
                try:  # submodule import (packages don't hasattr them)
                    importlib.import_module(f"{m.group(1)}.{name}")
                except ImportError:
                    raise AssertionError(
                        f"{ln!r}: {name} missing from {m.group(1)}"
                    ) from None
        else:
            importlib.import_module(ln.split()[1])


def test_module_attribute_references_exist():
    """Aliased usages like SIM.brute_force_topk / CU.assign_splits /
    EX.check / parity.QUERIES must exist on the aliased modules."""
    # the cookbook's import style: `from notion_spark.pipeline import curation as CU`
    alias_to_mod = {}
    for block in _code_blocks():
        for m in re.finditer(r"from (\S+) import (\w+) as (\w+)", block):
            alias_to_mod[m.group(3)] = f"{m.group(1)}.{m.group(2)}"
    alias_to_mod["parity"] = "notion_spark.parity"
    used = {
        (alias, attr)
        for block in _code_blocks()
        for alias, attr in re.findall(r"\b([A-Z]{2,}|parity)\.(\w+)", block)
        if alias in alias_to_mod
    }
    assert used
    for alias, attr in sorted(used):
        mod = importlib.import_module(alias_to_mod[alias])
        assert hasattr(mod, attr), f"{alias}.{attr} ({alias_to_mod[alias]}) missing"
