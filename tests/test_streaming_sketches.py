"""Streaming windowed HLL: register rows equal the batch builder's for
the same data (so the shared estimator gives identical estimates), late
in-watermark data folds in, and state is window-bounded by construction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from notion_spark.pipeline.sketches import hll_estimate, hll_registers
from notion_spark.streaming.sketches import hll_windowed_registers

SCHEMA = "ts timestamp, user string"
T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _rows():
    # window A [12:00, 12:10): users u0..u19; window B [12:10, 12:20):
    # users u10..u24 (overlap on purpose — distinct is per window)
    rows = [(T0 + dt.timedelta(minutes=i % 10), f"u{i % 20}") for i in range(60)]
    rows += [
        (T0 + dt.timedelta(minutes=10 + i % 10), f"u{10 + i % 15}") for i in range(45)
    ]
    return rows


def test_windowed_registers_match_batch(spark, tmp_path):
    rows = _rows()
    src = tmp_path / "hll_src"
    src.mkdir()
    # batch 2 carries LATE rows for window A (event times before batch
    # 1's max) — still inside the 10-minute watermark, so they must fold
    # into window A's registers
    spark.createDataFrame(rows[:80], SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[80:] + rows[5:15], SCHEMA).coalesce(1).write.parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        hll_windowed_registers(stream, "ts", "user", "10 minutes", "10 minutes")
        .writeStream.format("memory")
        .queryName("hll_win")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got: dict = {}
    for r in spark.sql("SELECT * FROM hll_win").collect():
        got[(r.window_start, r.bucket)] = r.rho  # update mode: last wins

    # batch equivalent: same data, same window assignment, same registers
    all_df = spark.createDataFrame(rows + rows[5:15], SCHEMA).withColumn(
        "window_start", F.window("ts", "10 minutes")["start"]
    )
    batch = hll_registers(all_df, "user", by=["window_start"])
    want = {(r.window_start, r.bucket): r.rho for r in batch.collect()}
    assert got == want

    # shared estimator on identical registers -> identical estimates,
    # and both windows land near their true cardinalities (20 and 15)
    got_df = spark.createDataFrame(
        [(k[0], k[1], v) for k, v in got.items()],
        "window_start timestamp, bucket long, rho int",
    )
    est_s = {r.window_start: r.est_distinct
             for r in hll_estimate(got_df, by=["window_start"]).collect()}
    est_b = {r.window_start: r.est_distinct
             for r in hll_estimate(batch.select("window_start", "bucket", "rho"),
                                   by=["window_start"]).collect()}
    assert est_s == est_b
    (wa, wb) = sorted(est_s)
    assert abs(est_s[wa] - 20) < 3 and abs(est_s[wb] - 15) < 3
