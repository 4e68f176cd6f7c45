"""Watermarked stream-stream interval join.

The attribution question ("which click followed which impression within
N minutes?") over two UNBOUNDED streams: Spark buffers both sides in
state and needs explicit bounds to ever release it —

- a watermark on BOTH event-time columns (how late data can be), and
- an interval condition relating the two event times (how far apart
  matches can be).

Together they let the engine prove "no future row can match this one"
and evict it. Without the interval bound the state grows forever; this
wrapper makes the bound mandatory and builds the canonical condition so
callers can't accidentally ship an unbounded join.

Batch equivalence: on static frames the same function degrades to a
plain range-condition join (watermarks are no-ops in batch) — the
equivalence test pins that the streaming output matches the batch join
row-for-row, which is the correctness contract for any custom
streaming operator in this repo (SURVEY §5).

Scale: state per key is bounded by (watermark + interval) × arrival
rate. The join itself shuffles both sides on the equality key — same
cost as any stream-stream join; AQE does not apply to streaming, so
size `spark.sql.shuffle.partitions` for the steady-state rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "15 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` rows sharing ``key`` where
    ``right_ts`` falls in [left_ts, left_ts + max_delay]. Streaming
    frames get watermarks on both sides; static frames pass through
    (withWatermark is a no-op there, but Spark rejects it on
    non-streaming plans, so it is applied conditionally).

    Column names must be disjoint apart from ``key`` — rename first.
    ``how`` supports inner and leftOuter (outer emits only after the
    watermark proves no match can arrive)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"interval {max_delay}"))
    )
    joined = l.join(r, on=cond, how=how)
    # drop the duplicated key column (keep the left one)
    return joined.drop(r[key])
