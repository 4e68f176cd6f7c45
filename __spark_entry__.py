"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``notion_spark.parity`` — one named query per
operator family in SURVEY.md §2 plus the training-data pipeline operators
(dedup / similarity / text analysis), each with a DuckDB oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from notion_spark import parity


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return parity.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered so never-driver-checked queries occupy the driver's
    # 50-query verification window first (see parity.DRIVER_CHECKED).
    return parity.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(parity.ORACLES)
