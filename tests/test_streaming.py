from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from notion_spark.streaming.upsert import stream_upsert, windowed_counts


def test_stream_upsert_keep_last(spark, tmp_path):
    src = tmp_path / "incoming"
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "uid string, status string, updated_time timestamp"

    t = dt.datetime(2026, 1, 1)
    batch1 = spark.createDataFrame(
        [("u1", "to do", t), ("u2", "to do", t), ("u1", "doing", t + dt.timedelta(hours=1))],
        schema,
    )
    src.mkdir()
    batch1.write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 10).parquet(
        str(src / "*")
    )
    q = stream_upsert(stream, store, ckpt, key="uid", order_by_cols=["updated_time"])
    q.awaitTermination(120)

    rows = {r.uid: r for r in spark.read.parquet(store).collect()}
    assert len(rows) == 2
    assert rows["u1"].status == "doing"  # within-batch keep-last

    # second micro-batch updates u2, inserts u3
    batch2 = spark.createDataFrame(
        [("u2", "done", t + dt.timedelta(days=1)), ("u3", "to do", t)], schema
    )
    batch2.write.parquet(str(src / "b2"))
    q2 = stream_upsert(
        spark.readStream.schema(schema).parquet(str(src / "*")),
        store,
        ckpt,
        key="uid",
        order_by_cols=["updated_time"],
    )
    q2.awaitTermination(120)
    rows = {r.uid: r for r in spark.read.parquet(store).collect()}
    assert len(rows) == 3
    assert rows["u2"].status == "done" and rows["u1"].status == "doing"


def test_windowed_counts_batch_semantics(spark):
    # windowed_counts is stream-agnostic column algebra; validate on batch
    t0 = dt.datetime(2026, 1, 5)  # a Monday
    rows = [(t0 + dt.timedelta(days=d), "done") for d in range(10)]
    df = spark.createDataFrame(rows, "completed timestamp, status string")
    out = windowed_counts(df, "completed", "status")
    got = {(r.window_start, r["count"]) for r in out.collect()}
    # 10 consecutive days spanning two ISO weeks: 7 + 3
    assert sorted(c for _, c in got) == [3, 7]
