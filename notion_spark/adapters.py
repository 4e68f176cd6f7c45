"""Schema adapters: run the task-domain query suites on arbitrary tables.

`tasks_from_orders` maps the synthetic orders table into the canonical
tasks schema (SURVEY §1.1) so the EP2/EP3 suites execute at relational
scale — the proof that the operator library "runs unmodified on arbitrary
tables" (BASELINE.json north star). The mapping is pure column algebra,
so analysis-over-orders is also expressible as oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_spark.sources.io import read_table

# o_orderstatus -> task status; o_orderpriority -> priority ladder
STATUS_MAP = {"O": "Doing", "F": "Done", "P": "To Do"}
PRIORITY_MAP = {
    "1-URGENT": "Critical (48hrs)",
    "2-HIGH": "High (1wk)",
    "3-MEDIUM": "Medium (2wks)",
    "4-NOT SPECIFIED": "Note",
    "5-LOW": "Low (>month)",
}


def tasks_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> tasks-shaped frame: orderkey as nid/uid, orderdate as
    created/started, due = created + 30d, completed = created + 14d for
    Done rows, customer as parent, priority ladder mapped."""
    o = read_table(spark, sf_dir, "orders")
    smap = F.create_map(*[F.lit(x) for kv in STATUS_MAP.items() for x in kv])
    pmap = F.create_map(*[F.lit(x) for kv in PRIORITY_MAP.items() for x in kv])
    status = smap[F.col("o_orderstatus")]
    return o.select(
        F.concat(F.lit("order-"), F.col("o_orderkey")).alias("uid"),
        F.col("o_orderkey").alias("nid"),
        F.concat(F.lit("Order "), F.col("o_orderkey")).alias("name"),
        F.lit("").alias("body_content"),
        status.alias("status"),
        F.col("o_orderdate").alias("started"),
        F.when(status == "Done", F.date_add(F.col("o_orderdate"), 14).cast("timestamp"))
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("completed"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due"),
        F.col("o_orderdate").alias("updated_time"),
        pmap[F.col("o_orderpriority")].alias("priority"),
        F.array().cast("array<string>").alias("files_media"),
        F.col("o_orderdate").alias("created"),
        F.lit(None).cast("string").alias("parent_uid"),
        F.col("o_custkey").alias("parent_nid"),
        F.array().cast("array<string>").alias("children_uids"),
        F.array().cast("array<long>").alias("children_nids"),
        F.array(F.col("o_orderpriority")).alias("active_tags"),
        F.lit("").alias("comments"),
    )
