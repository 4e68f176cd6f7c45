from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline.sharding import (
    deterministic_shuffle,
    with_shard,
    write_training_shards,
)


def test_with_shard_stable_and_balanced(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = {r.id: r.shard for r in with_shard(df, "id", 8).collect()}
    b = {r.id: r.shard for r in with_shard(df.repartition(7), "id", 8).collect()}
    assert a == b  # partition-layout independent
    sizes = {}
    for s in a.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 2 * min(sizes.values())  # roughly balanced


def test_deterministic_shuffle_reproducible(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    o1 = [r.id for r in deterministic_shuffle(df, "id").collect()]
    o2 = [r.id for r in deterministic_shuffle(df.repartition(5), "id").collect()]
    assert o1 == o2
    assert o1 != sorted(o1)  # actually shuffled
    assert [r.id for r in deterministic_shuffle(df, "id", seed=7).collect()] != o1


def test_write_training_shards(spark, tmp_path):
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(1000)], "id long, text string")
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "id", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.select("shard").distinct().count() == 4
    # shard membership matches with_shard
    expected = {r.id: r.shard for r in with_shard(df, "id", 4).collect()}
    got = {r.id: r.shard for r in back.collect()}
    assert got == expected
