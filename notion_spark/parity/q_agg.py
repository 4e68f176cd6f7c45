"""Aggregations (SURVEY §2.6).

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403

# =====================================================================
# Aggregations (SURVEY §2.6)
# =====================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary — the A1/A2 conditional
    aggregate pattern at scale. Single scan, map-side partial agg, shuffle
    only carries (flag,status) partials."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_conditional_counts",
    """
    SELECT COUNT(*) AS total,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_finished,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS BIGINT) AS n_urgent,
           CAST(COALESCE(SUM(CASE WHEN o_totalprice > 100000 THEN 1 END), 0) AS BIGINT) AS n_large
    FROM orders
    """,
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the reference's four boolean-filter len() passes
    (analyze_pages.py:358-379) as ONE aggregate."""
    o = read_table(spark, sf_dir, "orders")
    return conditional_counts(
        o,
        {
            "n_open": F.col("o_orderstatus") == "O",
            "n_finished": F.col("o_orderstatus") == "F",
            "n_urgent": F.col("o_orderpriority") == "1-URGENT",
            "n_large": F.col("o_totalprice") > 100000,
        },
    ).select(
        F.col("total").cast("long"),
        F.col("n_open").cast("long"),
        F.col("n_finished").cast("long"),
        F.col("n_urgent").cast("long"),
        F.col("n_large").cast("long"),
    )


@register(
    "agg_status_counts",
    "SELECT o_orderstatus, COUNT(*) AS count FROM orders GROUP BY o_orderstatus",
)
def agg_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: value_counts (analyze_pages.py:466)."""
    return value_counts(read_table(spark, sf_dir, "orders"), "o_orderstatus")


@register(
    "agg_weekly_velocity",
    """
    SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
           COUNT(*) AS count
    FROM events
    GROUP BY 1 ORDER BY week_start DESC LIMIT 12
    """,
)
def agg_weekly_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: weekly completion-velocity resample + tail(12)
    (analyze_pages.py:438-439), ISO-Monday weeks."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(_fmt_d(F.date_trunc("week", F.col("ts"))).alias("week_start"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("week_start"))
        .limit(12)
    )


@register(
    "agg_created_per_week",
    """
    SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           COUNT(*) AS count
    FROM orders GROUP BY 1
    """,
)
def agg_created_per_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: created-per-week histogram (golden sample lines 73-77)."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy(_fmt_d(F.date_trunc("week", F.col("o_orderdate"))).alias("week_start")).agg(
        F.count(F.lit(1)).alias("count")
    )


@register(
    "agg_avg_completion_days",
    """
    SELECT CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_days,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def agg_avg_completion_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: average order→ship latency in days
    (sample_analysis_output.txt:18). Exact integer-day sum / count."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(
            (F.sum(dd).cast("double") / F.count(F.lit(1))).alias("avg_days"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIAS = ["p_urgent", "p_high", "p_medium", "p_unspecified", "p_low"]


@register(
    "agg_crosstab_status_priority",
    "SELECT o_orderstatus, "
    + ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 END), 0) AS BIGINT) AS {a}"
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIAS)
    )
    + " FROM orders GROUP BY o_orderstatus",
)
def agg_crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: Status × Priority crosstab (sample_analysis_output.txt:56-65).
    Explicit conditional sums (= pivot with fixed values) so column names
    are stable for the oracle."""
    o = read_table(spark, sf_dir, "orders")
    aggs = [
        F.coalesce(F.sum(F.when(F.col("o_orderpriority") == p, 1)), F.lit(0)).cast("long").alias(a)
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIAS)
    ]
    return o.groupBy("o_orderstatus").agg(*aggs)


@register(
    "agg_union_pie",
    """
    SELECT section, COUNT(*) AS count FROM (
        SELECT 'goals' AS section FROM orders WHERE o_orderstatus = 'P'
        UNION ALL
        SELECT 'completed' AS section FROM orders
        WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        UNION ALL
        SELECT 'in_progress' AS section FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY section
    """,
)
def agg_union_pie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + §2.8: union of three section frames then value_counts
    (generate_reports.py:226-234)."""
    o = read_table(spark, sf_dir, "orders")
    goals = o.filter(F.col("o_orderstatus") == "P").select(F.lit("goals").alias("section"))
    completed = o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
    ).select(F.lit("completed").alias("section"))
    in_prog = o.filter(F.col("o_orderstatus") == "O").select(F.lit("in_progress").alias("section"))
    return (
        goals.unionByName(completed)
        .unionByName(in_prog)
        .groupBy("section")
        .agg(F.count(F.lit(1)).alias("count"))
    )


