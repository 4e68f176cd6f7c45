"""The report query suite (EP3 parity — reference backend/
generate_reports.py). Period-windowed section frames with parent-name
broadcast join, grouped sorts and the goals overflow policy; the PDF
assembly itself is a driver-side render over these already-sorted frames
(sinks/pdf_report.py holds the stub — fpdf is not in this container).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from notion_spark.config import REPORT_PERIOD_DAYS, EngineConfig
from notion_spark.operators.filters import array_overlap_filter, overflow_policy_filter
from notion_spark.operators.joins import broadcast_lookup

NO_PROJECT = "General / No Project"


def resolve_period(
    period: str, now: datetime, custom: tuple[datetime, datetime] | None = None
) -> tuple[datetime, datetime]:
    """F11 window resolution (generate_reports.py:336-388): period end =
    now, start = end − period days; custom passes explicit bounds."""
    if period == "custom":
        if custom is None:
            raise ValueError("custom period requires explicit (start, end)")
        return custom
    days = REPORT_PERIOD_DAYS[period]
    return now - timedelta(days=days), now


def _ts(dt: datetime) -> Column:
    return F.lit(dt.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")


def with_parent_name(
    df: DataFrame, lookup: DataFrame | None = None, default: str = NO_PROJECT
) -> DataFrame:
    """J1 (generate_reports.py:320): NID→Name broadcast self-join. The
    reference builds nid_to_name from the FULL frame BEFORE any section
    filtering — pass that frame as ``lookup`` (section frames have had
    containers removed by clean_task_list, so a self-derived lookup would
    resolve almost nothing). Fill defaults differ per section — '' for
    goals/completed (:469, :482), 'General / No Project' for in_progress
    (:493-495) — and the fill value participates in the grouped SORT, so
    it must be faithful."""
    src = lookup if lookup is not None else df
    parents = src.filter(F.col("nid") != 0).select("nid", "name")
    return broadcast_lookup(
        df, parents, "parent_nid", "nid", "name", "parent_name", default=default
    )


def clean_task_list(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """F13 (generate_reports.py:424-440): drop container rows whose body
    is empty — body is always treated as empty when include_body_content
    is off, matching the reference.

    'Container' = the row's OWN children list is non-empty
    (parent_nids_set at generate_reports.py:330-332 is built from
    `Children NIDs`), i.e. the is_project flag — NOT reverse parent_nid
    edges, which diverge on one-way links."""
    is_container = (
        F.col("is_project")
        if "is_project" in df.columns
        else F.size("children_nids") > 0
    )
    body_empty = (
        F.lit(True)
        if not cfg.include_body_content
        else F.coalesce(F.length(F.trim("body_content")), F.lit(0)) == 0
    )
    return df.filter(~(is_container & body_empty))


def goals(
    df: DataFrame,
    start: datetime,
    end: datetime,
    cfg: EngineConfig,
    lookup: DataFrame | None = None,
) -> DataFrame:
    """F12+O6 (generate_reports.py:444-470): ALL 'to do' rows; when they
    overflow the page budget (>15) keep only due-within-14d-of-period-end
    OR priority ≤ High; grouped sort (parent, priority, due), parent fill
    '' (:469 — the fill value sorts first, deliberately).

    (The dated/undated pre-filter at :393-405 is dead code — its `goals`
    is overwritten by this path before any use.)"""
    todo = df.filter(F.lower("status") == "to do")
    keep = (F.col("priority_score") <= 1) | (
        F.col("due").isNotNull() & (F.col("due") <= _ts(end + timedelta(days=14)))
    )
    selected = overflow_policy_filter(todo, cfg.goals_overflow_threshold, keep)
    return with_parent_name(selected, lookup=lookup, default="").orderBy(
        "parent_name", "priority_score", F.asc_nulls_last("due"), "nid"
    )


def completed_in_period(
    df: DataFrame, start: datetime, end: datetime, lookup: DataFrame | None = None
) -> DataFrame:
    """F11+O7 (generate_reports.py:407-412, 483-485): done within the
    window, sorted (parent asc, completed desc)."""
    done = df.filter(
        (F.lower("status") == "done")
        & F.col("completed").between(_ts(start), _ts(end))
    )
    return with_parent_name(done, lookup=lookup, default="").orderBy(
        "parent_name", F.desc("completed"), "nid"
    )


def in_progress(df: DataFrame, lookup: DataFrame | None = None) -> DataFrame:
    """O8 (generate_reports.py:489-496): doing rows, (parent, priority)."""
    doing = df.filter(F.lower("status") == "doing")
    return with_parent_name(doing, lookup=lookup).orderBy("parent_name", "priority_score", "nid")


def uncategorized_report(df: DataFrame) -> DataFrame:
    """F8 reports variant (generate_reports.py:417-421, 499-503)."""
    from notion_spark.operators.filters import uncategorized_filter

    return uncategorized_filter(df).orderBy("nid")


def section_pie_counts(
    goals_df: DataFrame, completed_df: DataFrame, in_progress_df: DataFrame
) -> DataFrame:
    """A5 (generate_reports.py:226-234): union of the three section frames
    → status frequency for the pie chart."""
    unioned = (
        goals_df.select("status")
        .unionByName(completed_df.select("status"))
        .unionByName(in_progress_df.select("status"))
    )
    return unioned.groupBy("status").agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), "status"
    )


def report_frames(
    df: DataFrame,
    period: str,
    now: datetime,
    cfg: EngineConfig,
    custom: tuple[datetime, datetime] | None = None,
) -> dict[str, DataFrame]:
    """EP3 section map (generate_reports.py:390-503). ``df`` must be
    normalize_for_reports output; tag filter applies first
    (generate_reports.py:177-192)."""
    start, end = resolve_period(period, now, custom)
    tagged = array_overlap_filter(df, "active_tags", cfg.filter_tags)
    base = clean_task_list(tagged, cfg)
    # parent-name lookup comes from the PRE-clean frame (the reference
    # builds nid_to_name before dropping containers, :317-320)
    g = goals(base, start, end, cfg, lookup=tagged)
    c = completed_in_period(base, start, end, lookup=tagged)
    p = in_progress(base, lookup=tagged)
    out = {
        "goals": g,
        "completed": c,
        "in_progress": p,
        "pie_counts": section_pie_counts(g, c, p),
    }
    if cfg.include_uncategorized:
        # the reference does NOT clean_task_list the catch-all section
        # (generate_reports.py:499-503 filters the raw frame)
        out["uncategorized"] = uncategorized_report(tagged)
    return out
