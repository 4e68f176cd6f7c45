"""The analysis query suite (EP2 parity — reference backend/
analyze_pages.py). Every function takes the NORMALIZED tasks frame
(normalize.normalize_for_analysis), an injected ``now`` timestamp and an
EngineConfig, and returns a lazy DataFrame. Nothing collects; the text/
chart sinks do.

The reference re-filters one eagerly-mutated frame per section; here each
section is a lazy plan over a shared cached canonical frame (SURVEY §4),
with explicit unique tiebreakers (nid) appended to every reference sort.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from notion_spark.config import EngineConfig
from notion_spark.operators.aggregates import (
    avg_days_between,
    conditional_counts,
    crosstab_counts,
    value_counts,
    weekly_counts,
)
from notion_spark.operators.filters import anti_members, array_overlap_filter, status_in
from notion_spark.operators.sorts import top_k


def _now_lit(now: datetime) -> Column:
    return F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")


def apply_tag_filter(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """F1 (analyze_pages.py:95-108): active FILTER_TAGS drop non-matching
    rows (empty tag arrays drop too)."""
    return array_overlap_filter(df, "active_tags", cfg.filter_tags)


# --------------------------------------------------------------- predicates
def active_pred() -> Column:
    """F2: lower(status) ∈ {to do, doing} ∧ ¬project
    (analyze_pages.py:289-293)."""
    return status_in("status", ["to do", "doing"]) & ~F.col("is_project")


# --------------------------------------------------------------- sections
def immediate_action(df: DataFrame, now: datetime) -> DataFrame:
    """F3+O1 (analyze_pages.py:296-302): active ∧ due set ∧ (overdue ∨
    doing), sorted (priority, due)."""
    pred = (
        active_pred()
        & F.col("due").isNotNull()
        & ((F.col("due") < _now_lit(now)) | (F.lower("status") == "doing"))
    )
    return df.filter(pred).orderBy("priority_score", "due", "nid")


def due_this_week(df: DataFrame, now: datetime) -> DataFrame:
    """F4+O2 (analyze_pages.py:311-315): active, now ≤ due ≤ now+7d, minus
    immediate rows, sorted (due, priority)."""
    week_end = _now_lit(now) + F.expr("INTERVAL 7 DAYS")
    in_window = df.filter(
        active_pred() & F.col("due").between(_now_lit(now), week_end)
    )
    return anti_members(in_window, immediate_action(df, now), "nid").orderBy(
        "due", "priority_score", "nid"
    )


def backlog(df: DataFrame, now: datetime, cfg: EngineConfig) -> DataFrame:
    """F5+O3 (analyze_pages.py:324-341): active minus (immediate ∪
    due-week), then ONE list: the dated remainder sorted (due, priority)
    when any exists, ELSE the undated remainder sorted (priority,
    created); head(15).

    The reference's `if not dated_backlog.empty` branch is encoded
    LAZILY: both branch top-15s union (≤ 30 rows) and a window count of
    dated rows picks the branch — no eager driver-side job, so building
    the section map stays free until a sink collects it."""
    rest = anti_members(
        anti_members(df.filter(active_pred()), immediate_action(df, now), "nid"),
        due_this_week(df, now),
        "nid",
    )
    dated15 = top_k(
        rest.filter(F.col("due").isNotNull()),
        [F.asc("due"), F.asc("priority_score")],
        cfg.backlog_limit,
        tiebreaker=F.asc("nid"),
    ).withColumn("__dated", F.lit(1))
    undated15 = top_k(
        rest.filter(F.col("due").isNull()),
        [F.asc("priority_score"), F.asc("created")],
        cfg.backlog_limit,
        tiebreaker=F.asc("nid"),
    ).withColumn("__dated", F.lit(0))
    from pyspark.sql.window import Window

    unioned = dated15.unionByName(undated15)
    n_dated = F.sum("__dated").over(Window.partitionBy())  # ≤30-row window
    return (
        unioned.withColumn("__n_dated", n_dated)
        .filter(
            ((F.col("__n_dated") > 0) & (F.col("__dated") == 1))
            | ((F.col("__n_dated") == 0) & (F.col("__dated") == 0))
        )
        .drop("__dated", "__n_dated")
        # one final order serving both branches: dated rows sort (due,
        # priority) [ref :333-335]; undated rows (all-null due) fall
        # through to (priority, created) [ref :337-339]
        .orderBy(F.asc_nulls_last("due"), "priority_score", "created", "nid")
    )


def active_projects(df: DataFrame) -> DataFrame:
    """(analyze_pages.py:344-355): ACTIVE containers only — status in
    {to do, doing} — by priority."""
    return df.filter(
        F.col("is_project") & F.lower("status").isin("to do", "doing")
    ).orderBy("priority_score", "nid")


def task_summary(df: DataFrame) -> DataFrame:
    """A1 (analyze_pages.py:358-379): total/completed/doing/todo counts +
    percent complete, one pass."""
    out = conditional_counts(
        df,
        {
            "completed": F.lower("status").contains("done"),
            "doing": F.lower("status").contains("doing"),
            "todo": F.lower("status").contains("to do"),
        },
    )
    return out.withColumn(
        "pct_complete",
        F.round(F.col("completed") * 100.0 / F.greatest(F.col("total"), F.lit(1)), 2),
    )


def overdue(df: DataFrame, now: datetime) -> DataFrame:
    """F6 (analyze_pages.py:382-392)."""
    return df.filter(active_pred() & (F.col("due") < _now_lit(now))).orderBy("due", "nid")


def critical_high(df: DataFrame) -> DataFrame:
    """F7 (analyze_pages.py:395-404): priority_score ≤ 1, active."""
    return df.filter(active_pred() & (F.col("priority_score") <= 1)).orderBy(
        "priority_score", "nid"
    )


def oldest_pending(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """O5 (analyze_pages.py:407-419): nsmallest(5, created) of active."""
    return top_k(
        df.filter(active_pred()),
        [F.asc("created")],
        cfg.oldest_pending_limit,
        tiebreaker=F.asc("nid"),
    )


def uncategorized(df: DataFrame) -> DataFrame:
    """F8 (analyze_pages.py:230-243): status outside the known vocabulary
    (nulls were already defaulted to 'unknown' by normalization)."""
    from notion_spark.operators.filters import uncategorized_filter

    return uncategorized_filter(df).orderBy("nid")


def status_counts(df: DataFrame) -> DataFrame:
    """A2 (analyze_pages.py:466)."""
    return value_counts(df, "status")


def priority_counts(df: DataFrame) -> DataFrame:
    """A3 (analyze_pages.py:483)."""
    return value_counts(df, "priority")


def status_priority_crosstab(df: DataFrame) -> DataFrame:
    """A7 (golden sample lines 56-65)."""
    from notion_spark.config import PRIORITY_SCORES

    return crosstab_counts(df, "status", "priority", list(PRIORITY_SCORES))


def completion_velocity(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """A4 (analyze_pages.py:430-439): W-MON weekly completions, last 12.
    Exact status equality 'done' (the chart filter at :431), unlike the
    summary's substring counts (F9)."""
    done = df.filter((F.lower("status") == "done") & F.col("completed").isNotNull())
    return weekly_counts(done, "completed", anchor="MON", last_n=cfg.velocity_weeks)


def created_per_week(df: DataFrame) -> DataFrame:
    """A8 (golden sample line 73-77): W-SUN weekly created counts."""
    return weekly_counts(df, "created", anchor="SUN")


def next_by_priority(df: DataFrame, per_bucket: int = 5) -> DataFrame:
    """'Tasks to work on next based on priority' (golden sample lines
    29-55): for each priority label, the first ``per_bucket`` active tasks
    by due date — a windowed top-k PER GROUP, one shuffle."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("priority").orderBy(
        F.asc_nulls_last("due"), F.asc("nid")
    )
    return (
        df.filter(active_pred())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_bucket)
        .orderBy("priority_score", "rank")
    )


def overdue_top_by_priority(df: DataFrame, now: datetime, limit: int = 30) -> DataFrame:
    """'Top 30 overdue tasks by priority' (golden sample lines 12-16)."""
    return top_k(
        df.filter(active_pred() & (F.col("due") < _now_lit(now))),
        [F.asc("priority_score"), F.asc("due")],
        limit,
        tiebreaker=F.asc("nid"),
    )


def avg_completion_days(df: DataFrame) -> DataFrame:
    """A6 (golden sample line 18): mean(created → completed) days for done
    rows."""
    done = df.filter(F.lower("status").contains("done"))
    return avg_days_between(done, "created", "completed")


def run_all(df: DataFrame, now: datetime, cfg: EngineConfig) -> dict[str, DataFrame]:
    """The EP2 section map (analyze_pages.py:195-221 order). ``df`` must
    already be normalized; callers should .cache() it — ~12 sections reuse
    it (the reference instead re-reads its CSV every time, SURVEY §4)."""
    filtered = apply_tag_filter(df, cfg)
    out = {
        "task_summary": task_summary(filtered),
        "immediate_action": immediate_action(filtered, now),
        "due_this_week": due_this_week(filtered, now),
        "backlog": backlog(filtered, now, cfg),
        "active_projects": active_projects(filtered),
        "overdue": overdue(filtered, now),
        "overdue_top_by_priority": overdue_top_by_priority(filtered, now),
        "next_by_priority": next_by_priority(filtered),
        "critical_high": critical_high(filtered),
        "oldest_pending": oldest_pending(filtered, cfg),
        "status_counts": status_counts(filtered),
        "priority_counts": priority_counts(filtered),
        "status_priority_crosstab": status_priority_crosstab(filtered),
        "completion_velocity": completion_velocity(filtered, cfg),
        "created_per_week": created_per_week(filtered),
        "avg_completion_days": avg_completion_days(filtered),
    }
    if cfg.include_uncategorized:
        out["uncategorized"] = uncategorized(filtered)
    return out
