"""Projection / derivation (§2.3), string/date functions (§2.10).

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403
from notion_spark.parity.q_agg import _PRIORITIES

# =====================================================================
# Projection / derivation (§2.3) and string/date functions (§2.10)
# =====================================================================


@register(
    "proj_status_priority_scores",
    """
    SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                              ELSE lower(o_orderstatus) END AS status_norm,
           CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                WHEN '5-LOW' THEN 4 ELSE 5 END AS priority_score,
           COUNT(*) AS count
    FROM orders GROUP BY 1, 2
    """,
)
def proj_status_priority_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: status normalization map + priority scoring ladder
    (analyze_pages.py:154-180) applied to the orders vocabulary."""
    o = read_table(spark, sf_dir, "orders")
    status_map = F.create_map(F.lit("O"), F.lit("open"), F.lit("F"), F.lit("finished"))
    prio_pairs = [
        x
        for i, p in enumerate(_PRIORITIES)
        for x in (F.lit(p), F.lit(i))
    ]
    prio_map = F.create_map(*prio_pairs)
    return (
        o.select(
            F.coalesce(status_map[F.col("o_orderstatus")], F.lower("o_orderstatus")).alias("status_norm"),
            F.coalesce(prio_map[F.col("o_orderpriority")], F.lit(5)).cast("int").alias("priority_score"),
        )
        .groupBy("status_norm", "priority_score")
        .agg(F.count(F.lit(1)).alias("count"))
    )


@register(
    "proj_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def proj_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 analog: null-safe nested access — JSON property extraction from
    the events props payload, aggregated exactly (integer sum)."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@register(
    "text_truncate",
    """
    SELECT doc_id,
           CASE WHEN length(text) > 60 THEN substr(text, 1, 57) || '...' ELSE text END AS name_trunc
    FROM documents
    """,
)
def text_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: truncate_text(60) (text_style.py:142-149)."""
    from notion_spark.functions.text import truncate_text

    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", truncate_text("text", 60).alias("name_trunc"))


@register(
    "text_sanitize_filename",
    """
    SELECT doc_id,
           translate(source || ':' || CAST(doc_id AS VARCHAR) || '?v<1>.txt',
                     '<>:"/\\|?*', '_________') AS filename
    FROM documents
    """,
)
def text_sanitize_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: sanitize_filename (fetch_pages.py:462-467) over a synthesized
    hostile filename."""
    from notion_spark.functions.text import sanitize_filename

    d = read_table(spark, sf_dir, "documents")
    raw = F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"), F.lit("?v<1>.txt"))
    return d.select("doc_id", sanitize_filename(raw).alias("filename"))


@register(
    "text_line_slice",
    """
    SELECT doc_id,
           array_to_string(list_slice(str_split(text, ' '), 1, 5), ' ') AS head5
    FROM documents
    """,
)
def text_line_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: body truncation to N units via slice(split(...)) —
    (generate_reports.py:97-102), tokens standing in for lines."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5)).alias("head5")
    )


@register(
    "text_week_label",
    """
    SELECT CAST(isoyear(o_orderdate) AS VARCHAR) || '-W' ||
           lpad(CAST(week(o_orderdate) AS VARCHAR), 2, '0') AS week_label,
           COUNT(*) AS count
    FROM orders GROUP BY 1
    """,
)
def text_week_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: ISO week labels (generate_reports.py:372, 376)."""
    from notion_spark.functions.dates import iso_week_label

    o = read_table(spark, sf_dir, "orders")
    return o.groupBy(iso_week_label("o_orderdate").alias("week_label")).agg(
        F.count(F.lit(1)).alias("count")
    )


