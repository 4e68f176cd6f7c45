"""Sort / top-k operators (SURVEY §2.7 O1-O9).

pandas sorts are stable; Spark's distributed sort is not, so every sort
takes an explicit unique tiebreaker to make top-k deterministic (SURVEY §5
determinism rules). `orderBy().limit(k)` compiles to TakeOrderedAndProject —
a per-partition heap + driver merge, no global sort shuffle — which is the
right physical shape for top-k at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, keys: list[Column], k: int, tiebreaker: Column | None = None) -> DataFrame:
    """Deterministic top-k: ORDER BY keys..., tiebreaker LIMIT k."""
    order = list(keys) + ([tiebreaker] if tiebreaker is not None else [])
    return df.orderBy(*order).limit(k)


def sorted_view(df: DataFrame, keys: list[Column], tiebreaker: Column | None = None) -> DataFrame:
    """Full sort for render sinks (grouped report sections O6-O8). Only for
    frames that are about to be collected by a driver-side sink."""
    order = list(keys) + ([tiebreaker] if tiebreaker is not None else [])
    return df.orderBy(*order)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
) -> DataFrame:
    """Deterministic top-k WITHIN each group — "3 biggest orders per
    priority", the per-entity leaderboard `top_k` (global ORDER BY
    LIMIT) cannot express. ``order_cols`` must end in a unique
    tiebreak (the repo's top-k rule) so ``rank`` — emitted as a
    column — is reproducible.

    Scale shape: ONE hash shuffle on the group key and a row_number
    window bounded by each group's rows — never a global sort; with
    AQE, rank <= k prunes before the filter output shuffles anywhere.
    A single hot group serializes its own window task (inherent to
    per-group order); pre-aggregate or sample inside such a group
    upstream.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"top_k_per_group: k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
