"""2-D skyline (Pareto frontier) — dominance filtering.

"Cheapest part for its size class", "best quality score for its token
budget": a row survives when no other row is at least as good on both
axes and strictly better on one. The classic formulation is a
quadratic NOT EXISTS self-join; for one minimized and one maximized
integer axis the frontier is computable with two windows — sort by the
minimized axis, and a row is dominated iff a strictly-cheaper row
reaches its ``max_col`` (running max) or an equal-cost row exceeds it.

The scale shape is the textbook two-phase distributed skyline: a
partition-local prefilter with the same two windows keyed by the range
partition id (local skylines are a superset of the global one —
dominance within a partition is global dominance), then the exact
global pass over the survivors. Survivor volume is data-dependent
(anti-correlated axes keep everything), so the global pass rides an
in-plan cardinality guard instead of silently serializing a huge
frontier through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.functions.exactmath import guarded

__all__ = ["skyline_2d"]


def _dominated(min_col: str, max_col: str, *pid: str):
    """The two dominance windows under (minimize min_col, maximize
    max_col): strictly-cheaper running max (RANGE to -1 excludes equal
    costs exactly) and the equal-cost group max. Duplicated coordinate
    pairs survive both — dominance requires one strict inequality."""
    w_strict = (
        Window.partitionBy(*pid)
        .orderBy(F.col(min_col).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy(*pid, min_col)
    m_strict = F.max(F.col(max_col)).over(w_strict)
    m_same = F.max(F.col(max_col)).over(w_same)
    # the cheapest row's strict-predecessor frame is EMPTY -> NULL max;
    # NULL >= s is NULL and a NULL predicate would silently drop the
    # row in a filter — coalesce to "not dominated".
    return F.coalesce(m_strict >= F.col(max_col), F.lit(False)) | (
        m_same > F.col(max_col)
    )


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    num_partitions: int | None = None,
    max_skyline: int = 5_000_000,
) -> DataFrame:
    """All Pareto-optimal rows under (minimize ``min_col``, maximize
    ``max_col``), both INTEGER-valued (the strict-predecessor window
    uses a RANGE frame with offset -1, exact only on integers — scale
    fixed-point inputs to cents/units first). Rows with a null in
    either axis are excluded; exact coordinate duplicates all survive
    (neither dominates the other).

    Phase 1 prunes locally: range-repartition on (min_col asc,
    max_col desc) so each partition holds a contiguous cost band, then
    the dominance windows keyed by partition id — no cross-partition
    traffic, removes everything a same-partition row dominates. The
    local pass never removes a global-skyline row. Phase 2 applies the
    SAME windows globally to the survivors; that window is
    single-partition by nature, so an in-plan guard raises past
    ``max_skyline`` survivors (anti-correlated axes are the honest
    worst case — the frontier IS output-sized; bucket one axis first
    if that's the data).
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    ranged = base.repartitionByRange(
        n, F.col(min_col).asc(), F.col(max_col).desc()
    ).withColumn("__pid", F.spark_partition_id())
    local = (
        ranged.withColumn("__dom", _dominated(min_col, max_col, "__pid"))
        .filter(~F.col("__dom"))
        .drop("__pid", "__dom")
    )

    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gbig = guarded(
        F.count(F.lit(1)).over(wall) > F.lit(max_skyline),
        f"skyline_2d: > {max_skyline} locally-undominated rows — the exact"
        " global pass would serialize them through one task; the frontier is"
        " output-sized (anti-correlated axes?), bucket an axis first",
    )
    checked = local.select(
        *[gbig(F.col(c)).alias(c) for c in local.columns]
    )
    return (
        checked.withColumn("__dom", _dominated(min_col, max_col))
        .filter(~F.col("__dom"))
        .drop("__dom")
    )
