"""Streaming incremental materialized view (streaming/matview):
batch==stream equivalence, cross-batch merging, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.operators.matview import build_state
from notion_spark.streaming.matview import last_epoch, merge_batch, stream_refresh

SCHEMA = "k string, v double"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(path))


def test_stream_equals_batch_state(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    store = str(tmp_path / "store")
    _write(spark, src / "b1", [("a", 1.5), ("a", 2.5), ("b", 10.0)])
    _write(spark, src / "b2", [("a", 4.0), ("c", 7.0)])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        str(src / "*")
    )
    q = stream_refresh(
        stream, store, str(tmp_path / "ckpt"),
        keys=["k"], sums=["v"], mins=["v"], maxs=["v"],
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(store).collect()))
    want = sorted(
        map(
            tuple,
            build_state(
                spark.read.parquet(str(src / "*")),
                keys=["k"], sums=["v"], mins=["v"], maxs=["v"],
            ).collect(),
        )
    )
    assert got == want
    by_k = {r[0]: r for r in got}
    assert by_k["a"][1] == 3  # cnt merged across micro-batches

    # a later run folds only NEW files (checkpoint advances)
    _write(spark, src / "b3", [("b", -1.0)])
    q2 = stream_refresh(
        spark.readStream.schema(SCHEMA).parquet(str(src / "*")),
        store, str(tmp_path / "ckpt"),
        keys=["k"], sums=["v"], mins=["v"], maxs=["v"],
    )
    q2.awaitTermination(120)
    by_k = {r["k"]: r for r in spark.read.parquet(store).collect()}
    assert by_k["b"]["cnt"] == 2 and by_k["b"]["min_v"] == -1.0


def test_replayed_epoch_is_skipped(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = spark.createDataFrame([("a", 1.0)], SCHEMA)
    merge_batch(spark, batch, 0, store, keys=["k"], sums=["v"])
    merge_batch(spark, batch, 0, store, keys=["k"], sums=["v"])  # replay
    row = spark.read.parquet(store).first()
    assert row["cnt"] == 1  # not double-counted
    assert last_epoch(store) == 0
    merge_batch(spark, batch, 1, store, keys=["k"], sums=["v"])
    assert spark.read.parquet(store).first()["cnt"] == 2


def test_crash_between_rmtree_and_rename_recovers(spark, tmp_path):
    """Simulate the torn swap: store removed, complete tmp (with epoch
    marker) left behind. last_epoch/merge_batch must promote the tmp,
    not rebuild the view from the replayed batch alone."""
    import shutil

    store = str(tmp_path / "store")
    b0 = spark.createDataFrame([("a", 1.0)], SCHEMA)
    b1 = spark.createDataFrame([("a", 2.0)], SCHEMA)
    merge_batch(spark, b0, 0, store, keys=["k"], sums=["v"])
    merge_batch(spark, b1, 1, store, keys=["k"], sums=["v"])
    # tear: move the committed store to .tmp and delete the store,
    # exactly the state after rmtree but before rename
    shutil.move(store, store + ".tmp")
    assert last_epoch(store) == 1  # recovery promoted the tmp
    # the replay of epoch 1 is now a no-op, state intact
    merge_batch(spark, b1, 1, store, keys=["k"], sums=["v"])
    row = spark.read.parquet(store).first()
    assert row["cnt"] == 2 and float(row["sum_v"]) == 3.0
