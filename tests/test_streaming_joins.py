"""Watermarked stream-stream interval join (streaming/joins)."""

from __future__ import annotations

import datetime as dt

import pytest

from notion_spark.streaming.joins import interval_join

IMP_SCHEMA = "k string, imp_ts timestamp, imp_id int"
CLK_SCHEMA = "k string, clk_ts timestamp, clk_id int"

T0 = dt.datetime(2026, 1, 1, 12, 0)


def _data():
    imps = [
        ("u1", T0, 1),
        ("u1", T0 + dt.timedelta(minutes=30), 2),
        ("u2", T0, 3),
    ]
    clicks = [
        ("u1", T0 + dt.timedelta(minutes=5), 10),   # matches imp 1
        ("u1", T0 + dt.timedelta(minutes=31), 11),  # matches imp 2 only
        ("u2", T0 + dt.timedelta(minutes=20), 12),  # outside 15m window
        ("u3", T0, 13),                             # no impression
    ]
    return imps, clicks


def _want():
    return {(1, 10), (2, 11)}


def test_batch_semantics(spark):
    imps, clicks = _data()
    out = interval_join(
        spark.createDataFrame(imps, IMP_SCHEMA),
        spark.createDataFrame(clicks, CLK_SCHEMA),
        "k",
        "imp_ts",
        "clk_ts",
        max_delay="15 minutes",
    )
    got = {(r["imp_id"], r["clk_id"]) for r in out.collect()}
    assert got == _want()
    assert "k" in out.columns and out.columns.count("k") == 1


def test_stream_equals_batch(spark, tmp_path):
    imps, clicks = _data()
    (tmp_path / "imp").mkdir()
    (tmp_path / "clk").mkdir()
    spark.createDataFrame(imps, IMP_SCHEMA).write.parquet(str(tmp_path / "imp" / "b"))
    spark.createDataFrame(clicks, CLK_SCHEMA).write.parquet(str(tmp_path / "clk" / "b"))

    s_imp = spark.readStream.schema(IMP_SCHEMA).parquet(str(tmp_path / "imp" / "*"))
    s_clk = spark.readStream.schema(CLK_SCHEMA).parquet(str(tmp_path / "clk" / "*"))
    joined = interval_join(s_imp, s_clk, "k", "imp_ts", "clk_ts", max_delay="15 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["imp_id"], r["clk_id"]) for r in spark.sql("SELECT * FROM ij_out").collect()
    }
    assert got == _want()


def test_rejects_unsupported_join_type(spark):
    imps, clicks = _data()
    with pytest.raises(ValueError):
        interval_join(
            spark.createDataFrame(imps, IMP_SCHEMA),
            spark.createDataFrame(clicks, CLK_SCHEMA),
            "k", "imp_ts", "clk_ts", how="fullOuter",
        )


def test_left_outer_emits_unmatched(spark):
    imps, clicks = _data()
    out = interval_join(
        spark.createDataFrame(imps, IMP_SCHEMA),
        spark.createDataFrame(clicks, CLK_SCHEMA),
        "k", "imp_ts", "clk_ts",
        max_delay="15 minutes", how="leftOuter",
    )
    got = {(r["imp_id"], r["clk_id"]) for r in out.collect()}
    # matched pairs plus the never-clicked impression with NULL click
    assert got == _want() | {(3, None)}
