"""Joins (SURVEY §2.5) + incremental merge (§2.2).

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403

# =====================================================================
# Joins (SURVEY §2.5) + incremental merge (§2.2)
# =====================================================================


@register(
    "join_parent_name",
    """
    SELECT c_custkey, COALESCE(n_name, 'General / No Project') AS parent_name
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
)
def join_parent_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the parent-name dict-map (generate_reports.py:320) as an
    explicit broadcast lookup with fill default."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return broadcast_lookup(
        c, n, "c_nationkey", "n_nationkey", "n_name", "parent_name",
        default="General / No Project",
    ).select("c_custkey", "parent_name")


@register(
    "join_multi_hop_revenue",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multi_hop_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 generalized: bulk FK resolution chain lineitem→orders→customer→
    nation→region. The dims broadcast (AQE); the single real shuffle is the
    lineitem⋈orders join key."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "join_semi_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 semi: customers holding an open order (isin → left_semi)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return semi_members(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/F10 anti: customers with no orders at all (~isin → left_anti)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return anti_members(
        c, o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey")


@register(
    "merge_keep_last",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def merge_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: keep-last upsert semantics (drop_duplicates keep='last',
    fetch_pages.py:595-603) — latest event per user via one row_number
    window, single shuffle on the key."""
    ev = read_table(spark, sf_dir, "events")
    latest = latest_per_key(ev, "user_id", [F.desc("ts"), F.desc("event_id")])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
    )


@register(
    "incr_changed_rows",
    """
    SELECT event_id, user_id FROM events e1
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
      AND NOT EXISTS (
          SELECT 1 FROM events e2
          WHERE e2.ts < TIMESTAMP '2024-01-25 00:00:00'
            AND e2.event_id = e1.event_id AND e2.ts = e1.ts)
    """,
)
def incr_changed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: watermark change detection (fetch_pages.py:570-577) — rows of
    the new batch with no cache entry at the same (key, watermark), as a
    left-anti join."""
    ev = read_table(spark, sf_dir, "events")
    new = ev.filter(F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp"))
    cache = ev.filter(F.col("ts") < F.lit("2024-01-25 00:00:00").cast("timestamp"))
    return changed_rows(new, cache, "event_id", "ts").select("event_id", "user_id")


