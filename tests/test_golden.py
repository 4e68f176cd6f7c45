from __future__ import annotations

import os

from notion_spark.config import EngineConfig
from notion_spark.normalize import normalize_for_analysis
from notion_spark.queries import analysis as A
from notion_spark.sinks.text_report import render_analysis
from tests.fixtures import FIXED_NOW, make_tasks

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "analysis_output.txt")


def test_analysis_output_matches_golden(spark):
    """Full-pipeline determinism gate (SURVEY §5: golden-file tests from a
    fixed synthetic tasks table at the fixed clock). Any change to
    normalization, section predicates, sort tiebreakers, or the text sink
    that alters a single value/row/ordering fails here.

    To regenerate intentionally: delete the golden file and re-run.
    """
    cfg = EngineConfig()
    df = normalize_for_analysis(make_tasks(spark)).cache()
    text = render_analysis(A.run_all(df, FIXED_NOW, cfg), FIXED_NOW, cfg)
    df.unpersist()
    if not os.path.exists(GOLDEN):  # regeneration path
        with open(GOLDEN, "w") as f:
            f.write(text)
        raise AssertionError("golden file regenerated — rerun to verify")
    with open(GOLDEN) as f:
        expected = f.read()
    assert text == expected


def test_report_payloads_match_golden(spark):
    """EP3 determinism gate: weekly+yearly report payloads on the fixture
    at the fixed clock, compared structurally to the stored golden."""
    import json

    from notion_spark.normalize import normalize_for_reports
    from notion_spark.queries.reports import report_frames
    from notion_spark.sinks.pdf_report import report_payload

    path = os.path.join(os.path.dirname(__file__), "golden", "report_payloads.json")
    cfg = EngineConfig()
    df = normalize_for_reports(make_tasks(spark)).cache()
    got = {
        p: report_payload(report_frames(df, p, FIXED_NOW, cfg), p, FIXED_NOW, cfg)
        for p in ("weekly", "yearly")
    }
    df.unpersist()
    got = json.loads(json.dumps(got, sort_keys=True, default=str))
    with open(path) as f:
        expected = json.load(f)
    assert got == expected
