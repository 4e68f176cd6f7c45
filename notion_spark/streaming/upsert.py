"""Streaming keep-last upsert (M1/M2 continuous analogue).

`stream_upsert` wires a streaming source into a parquet-backed canonical
table via foreachBatch: each micro-batch is first reduced keep-last within
itself (a batch can carry several updates for one key), then merged with
the current store by operators.incremental.keep_last_upsert.

Parquet store + overwrite is the dependency-free stand-in for a Delta/
Iceberg MERGE: at production scale the same `merge_batch` body drops into
`DeltaTable.merge` unchanged (the dedup-within-batch step is identical).

`windowed_counts` is the event-time watermark aggregation the reference
never had (its weekly resample, made continuous).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from notion_spark.operators.incremental import keep_last_upsert, latest_per_key


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    key: str,
    order_by: list[Column],
) -> None:
    """One micro-batch merge: reduce the batch keep-last per key, then
    keep-last against the store (incoming wins ties)."""
    from notion_spark.sources.io import overwrite_store

    reduced = latest_per_key(batch, key, order_by)
    if os.path.exists(store_path):
        existing = spark.read.parquet(store_path)
        # recency-FIRST merge (incoming wins only ties): a replayed or
        # late micro-batch whose rows are older than the store must not
        # regress it — unlike the reference's batch M2, where incoming
        # unconditionally wins (keep_last_upsert)
        tagged = existing.withColumn("__src", F.lit(0)).unionByName(
            reduced.withColumn("__src", F.lit(1))
        )
        merged = latest_per_key(
            tagged, key, [*order_by, F.desc("__src")]
        ).drop("__src")
    else:
        merged = reduced
    # write-to-tmp-then-swap: merged's lineage READS store_path, so an
    # in-place overwrite could destroy the store on recomputation
    overwrite_store(merged, store_path)


def stream_upsert(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key: str,
    order_by_cols: list[str],
    trigger_once: bool = True,
) -> StreamingQuery:
    """Attach the merge to a streaming frame. ``order_by_cols`` are the
    descending-precedence recency columns (e.g. updated_time)."""

    def run(batch: DataFrame, _epoch: int) -> None:
        merge_batch(
            batch.sparkSession,
            batch,
            store_path,
            key,
            [F.desc(c) for c in order_by_cols],
        )

    writer = stream.writeStream.foreachBatch(run).option("checkpointLocation", checkpoint_path)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    window_duration: str = "1 week",
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time windowed counts with late-data watermark — the streaming
    version of the weekly velocity aggregate (A4)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), F.col(group_col))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "count",
        )
    )
