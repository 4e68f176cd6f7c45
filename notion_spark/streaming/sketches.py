"""Streaming sketches: distinct-count registers per event-time window.

`hll_windowed_registers` is a PURE built-in streaming aggregation —
`withWatermark` + `groupBy(window(ts), bucket).agg(max(rho))` — no
arbitrary-state API at all. Spark's streaming state store carries at
most 2^p register rows per open window (bounded regardless of stream
cardinality), late data inside the watermark updates registers in
place, and the watermark expires whole windows' state.

The emitted rows are IDENTICAL to the batch `sketches.hll_registers`
rows for the same window's data (pinned by the equivalence test), so
everything downstream is shared: estimate with `sketches.hll_estimate`,
merge across shards/streams with union + max(rho) per (window, bucket).
Approximate distinct-users-per-window at 100 TB/day is this plus a
sink.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from notion_spark.pipeline.sketches import hll_bucket_rho, md5_hash60


def hll_windowed_registers(
    stream: DataFrame,
    ts_col: str,
    col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    p: int = 8,
    hasher: Callable[[Column], Column] = md5_hash60,
) -> DataFrame:
    """(window_start, window_end, bucket, rho) register updates per
    tumbling event-time window. Estimate a window's cardinality by
    feeding its registers to `sketches.hll_estimate` (optionally grouped
    ``by=["window_start"]`` over the stored output)."""
    bucket, rho = hll_bucket_rho(F.col(col), p, hasher)
    return (
        stream.filter(F.col(col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).alias("win"),
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("win", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "bucket",
            "rho",
        )
    )
