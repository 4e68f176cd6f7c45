"""Shared registry state + helpers for the parity package (split from the
monolithic parity.py in r11; oracle text moved byte-identical)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.operators.aggregates import conditional_counts, value_counts
from notion_spark.operators.filters import (
    anti_members,
    not_in_filter,
    overflow_policy_filter,
    substring_filter,
)
from notion_spark.operators.incremental import changed_rows, latest_per_key
from notion_spark.operators.joins import broadcast_lookup, semi_members
from notion_spark.operators.sorts import top_k
from notion_spark.operators.windows import partitioned_group_boundaries
from notion_spark.pipeline import dedup as DD
from notion_spark.pipeline import similarity as SIM
from notion_spark.pipeline import text_analysis as TA
from notion_spark.sources.io import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

DEC = "decimal(18,2)"


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # refuse silent shadowing: a re-used name OVERWRITES the dict
        # key, and the driver-window rotation then treats the brand-new
        # code as already certified (the r11 agg_cube_counts collision
        # — caught only because the fresh window head came up short)
        if name in QUERIES:
            raise ValueError(
                f"register: query name {name!r} is already registered "
                "— shadowing a certified name silently skips driver "
                "re-certification; pick a new name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec_sum(col, alias: str):
    """Exact decimal sum surfaced as double (order-independent)."""
    return F.sum(F.col(col).cast(DEC)).cast("double").alias(alias)


def _fmt_d(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd")



__all__ = ['Callable', 'DataFrame', 'SparkSession', 'F', 'Window', 'conditional_counts', 'value_counts', 'anti_members', 'not_in_filter', 'overflow_policy_filter', 'substring_filter', 'changed_rows', 'latest_per_key', 'broadcast_lookup', 'semi_members', 'top_k', 'partitioned_group_boundaries', 'DD', 'SIM', 'TA', 'read_table', 'QUERIES', 'ORACLES', 'DEC', 'register', '_dec_sum', '_fmt_d']
