"""Sorts / top-k (§2.7) + windows (§2.9).

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403

# =====================================================================
# Sorts / top-k (§2.7) + windows (§2.9)
# =====================================================================


@register(
    "topk_oldest_pending",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate FROM orders
    WHERE o_orderstatus = 'P'
    ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 5
    """,
)
def topk_oldest_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: nsmallest(5, Created) (analyze_pages.py:412). Compiles to
    TakeOrderedAndProject — no global sort."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return top_k(o, [F.asc("o_orderdate")], 5, tiebreaker=F.asc("o_orderkey")).select(
        "o_orderkey", _fmt_d(F.col("o_orderdate")).alias("orderdate")
    )


@register(
    "window_group_boundaries",
    """
    SELECT user_id, COUNT(*) AS n_runs FROM (
        SELECT user_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE is_start = 1 GROUP BY user_id
    """,
)
def window_group_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: group-change section headers (generate_reports.py:527-546) —
    lag() boundary marking, partitioned by user so no global window."""
    ev = read_table(spark, sf_dir, "events")
    marked = partitioned_group_boundaries(
        ev, "user_id", "event_type", [F.asc("ts"), F.asc("event_id")]
    )
    return (
        marked.filter(F.col("is_group_start"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_runs"))
    )


