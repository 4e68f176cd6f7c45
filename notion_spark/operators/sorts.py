"""Sort / top-k operators (SURVEY §2.7 O1-O9).

pandas sorts are stable; Spark's distributed sort is not, so every sort
takes an explicit unique tiebreaker to make top-k deterministic (SURVEY §5
determinism rules). `orderBy().limit(k)` compiles to TakeOrderedAndProject —
a per-partition heap + driver merge, no global sort shuffle — which is the
right physical shape for top-k at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, keys: list[Column], k: int, tiebreaker: Column | None = None) -> DataFrame:
    """Deterministic top-k: ORDER BY keys..., tiebreaker LIMIT k."""
    order = list(keys) + ([tiebreaker] if tiebreaker is not None else [])
    return df.orderBy(*order).limit(k)


def sorted_view(df: DataFrame, keys: list[Column], tiebreaker: Column | None = None) -> DataFrame:
    """Full sort for render sinks (grouped report sections O6-O8). Only for
    frames that are about to be collected by a driver-side sink."""
    order = list(keys) + ([tiebreaker] if tiebreaker is not None else [])
    return df.orderBy(*order)
