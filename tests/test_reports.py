from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from notion_spark.config import EngineConfig
from notion_spark.normalize import normalize_for_reports
from notion_spark.queries import reports as R
from tests.fixtures import FIXED_NOW, make_tasks


@pytest.fixture(scope="module")
def tasks(spark):
    df = normalize_for_reports(make_tasks(spark)).cache()
    df.count()
    yield df
    df.unpersist()


CFG = EngineConfig()


def test_resolve_period_windows():
    for period, days in (("daily", 1), ("weekly", 7), ("biweekly", 14), ("monthly", 30), ("yearly", 365)):
        start, end = R.resolve_period(period, FIXED_NOW)
        assert end == FIXED_NOW and (end - start).days == days
    s, e = R.resolve_period("custom", FIXED_NOW, (FIXED_NOW - timedelta(days=3), FIXED_NOW))
    assert (e - s).days == 3
    with pytest.raises(ValueError):
        R.resolve_period("custom", FIXED_NOW)


def test_parent_name_join(tasks):
    out = R.with_parent_name(tasks)
    rows = {r.nid: r for r in out.collect()}
    names = {r.nid: r.name for r in tasks.collect() if r.nid != 0}
    for r in rows.values():
        if r.parent_nid and r.parent_nid in names:
            assert r.parent_name == names[r.parent_nid]
        else:
            assert r.parent_name == R.NO_PROJECT


def test_completed_in_period_window(tasks):
    start, end = R.resolve_period("yearly", FIXED_NOW)
    rows = R.completed_in_period(tasks, start, end).collect()
    assert rows
    for r in rows:
        assert "done" in r.status and start <= r.completed <= end
    # grouped sort: parent asc, completed desc within parent
    for a, b in zip(rows, rows[1:]):
        if a.parent_name == b.parent_name:
            assert a.completed >= b.completed


def test_goals_overflow_policy(tasks):
    start, end = R.resolve_period("weekly", FIXED_NOW)
    todo_count = tasks.filter(F.lower("status") == "to do").count()
    rows = R.goals(tasks, start, end, CFG).collect()
    assert rows
    if todo_count > CFG.goals_overflow_threshold:
        horizon = end + timedelta(days=14)
        for r in rows:
            assert r.priority_score <= 1 or (r.due is not None and r.due <= horizon)
    # grouped sort: parent asc ('' fill sorts first), priority within parent
    for a, b in zip(rows, rows[1:]):
        assert a.parent_name <= b.parent_name
        if a.parent_name == b.parent_name:
            assert a.priority_score <= b.priority_score


def test_clean_task_list_drops_empty_containers(tasks):
    out = R.clean_task_list(tasks, CFG)
    parent_ids = {r.parent_nid for r in tasks.collect() if r.parent_nid}
    kept = {r.nid for r in out.collect()}
    # with include_body_content=False every container is dropped
    assert not (kept & parent_ids)


def test_report_frames_and_pie(tasks):
    frames = R.report_frames(tasks, "yearly", FIXED_NOW, CFG)
    assert set(frames) >= {"goals", "completed", "in_progress", "pie_counts"}
    pie = {r.status: r["count"] for r in frames["pie_counts"].collect()}
    assert sum(pie.values()) == sum(
        frames[k].count() for k in ("goals", "completed", "in_progress")
    )


def test_report_payload_render_ready(tasks):
    from notion_spark.sinks.pdf_report import report_payload

    frames = R.report_frames(tasks, "yearly", FIXED_NOW, CFG)
    payload = report_payload(frames, "yearly", FIXED_NOW, CFG)
    assert payload["period"] == "yearly"
    assert payload["sections"]["goals"], "goals section empty"
    assert all("parent_name" in row for row in payload["sections"]["goals"])


def test_report_payload_with_attachments(spark, tasks):
    from dataclasses import replace

    from notion_spark.schema import ATTACHMENTS_SCHEMA
    from notion_spark.sinks.pdf_report import report_payload

    cfg = replace(CFG, include_body_content=True, include_attachments=True)
    nid = tasks.filter(F.lower("status") == "doing").first().nid
    att = spark.createDataFrame(
        [(nid, "notes.txt", ".txt", "attachment body"), (nid, "img.png", ".png", None)],
        ATTACHMENTS_SCHEMA,
    )
    frames = R.report_frames(tasks, "yearly", FIXED_NOW, cfg)
    payload = report_payload(frames, "yearly", FIXED_NOW, cfg, attachments=att)
    rows = [r for r in payload["sections"]["in_progress"] if r["nid"] == nid]
    assert rows and "notes.txt: attachment body" in rows[0]["body_content"]
    assert "img.png: (attachment)" in rows[0]["body_content"]  # unreadable ext listed by name
