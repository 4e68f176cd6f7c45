"""Binned range join: points-in-interval without the cross product.

A naive `p.ts BETWEEN i.start AND i.end` join has no equi-key, so Spark
falls back to BroadcastNestedLoopJoin — O(P×I) compares and a broadcast
requirement. The scalable decomposition (the same bin trick behind
Databricks' range-join optimization and KDB's window joins):

1. pick a bin width W;
2. each point maps to its single bin floor(ts / W);
3. each interval explodes to the bins it covers (ceil(len/W)+1 rows);
4. equi-join on the bin, then apply the exact BETWEEN as a post-filter.

The join is now a plain shuffled/broadcast hash join on a high-
cardinality key. A (point, interval) pair can only meet in the point's
ONE bin, so no dedup is needed. Choose W near the typical interval
length: the interval side then explodes ~2×, and each bin holds only
locally-overlapping rows. Skewed bins (a bin with millions of points
AND intervals) are AQE-skew-split like any hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Rows = every (point, interval) pair with start <= point <= end
    (inclusive both ends). Output carries all columns of both inputs;
    name collisions are the caller's to alias. ``how='inner'`` only —
    outer variants of a range join are a different operator."""
    if how != "inner":
        raise ValueError(f"range_join supports inner only, not {how!r}")

    def _bin(c: Column) -> Column:
        return F.floor(c.cast("timestamp").cast("double") / F.lit(bin_width_seconds))

    p = points.withColumn("__bin", _bin(F.col(point_col)))
    i = intervals.withColumn(
        "__bins",
        F.sequence(_bin(F.col(start_col)), _bin(F.col(end_col))),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    return (
        p.join(i, "__bin")
        .filter(
            F.col(point_col).cast("timestamp").between(
                F.col(start_col).cast("timestamp"), F.col(end_col).cast("timestamp")
            )
        )
        .drop("__bin")
    )
