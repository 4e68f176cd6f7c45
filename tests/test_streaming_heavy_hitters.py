"""Streaming Misra-Gries heavy hitters: the candidate superset guarantee
holds continuously across micro-batches, state stays bounded, and the
final summaries agree with the batch operator's answer set."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.streaming.heavy_hitters import heavy_hitters_stream

SCHEMA = "event_id long, value string"


def _skewed_rows():
    # hot: appears 300x, warm: 80x, 200 singletons -> n = 580
    rows, eid = [], 0
    for v, c in (("hot", 300), ("warm", 80)):
        for _ in range(c):
            rows.append((eid, v))
            eid += 1
    for i in range(200):
        rows.append((eid, f"cold{i}"))
        eid += 1
    return rows


def test_stream_candidates_superset_and_bounded(spark, tmp_path):
    rows = _skewed_rows()
    src = tmp_path / "hh_src"
    src.mkdir()
    # split mid-stream: 'hot' mass straddles the batch boundary, so its
    # counter must carry across state
    spark.createDataFrame(rows[:200], SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows[200:], SCHEMA).coalesce(1).write.parquet(str(src / "b2"))

    capacity, shards = 16, 4
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        heavy_hitters_stream(stream, "value", capacity=capacity, shards=shards)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # reader contract: each shard's LATEST seq is its full current
    # summary — older emissions may contain since-evicted values
    out_rows = spark.sql("SELECT * FROM hh_out").collect()
    latest = {}
    for r in out_rows:
        latest[r.shard] = max(latest.get(r.shard, 0), r.seq)
    per_shard: dict = {}
    for r in out_rows:
        if r.seq == latest[r.shard]:
            per_shard.setdefault(r.shard, {})[r.value] = r.est

    # state/output bound: every shard summary stays within capacity
    assert all(len(s) <= capacity for s in per_shard.values())

    # superset guarantee: every value with freq > n/(capacity+1) = 34
    # must survive with a positive underestimate
    cands = {v: e for s in per_shard.values() for v, e in s.items()}
    n = len(_skewed_rows())
    for v, true in (("hot", 300), ("warm", 80)):
        assert v in cands
        assert 0 < cands[v] <= true
        assert cands[v] >= true - n // (capacity + 1) - 1

    # exact recount of the streaming candidates == batch heavy_hitters
    from notion_spark.pipeline.sketches import heavy_hitters

    df = spark.createDataFrame(rows, SCHEMA)
    k = 5  # threshold n/k = 116 -> only 'hot' qualifies
    batch = {r.value: r.freq for r in heavy_hitters(df, "value", k=k).collect()}
    cand_df = spark.createDataFrame([(v,) for v in cands], "value string")
    recount = (
        df.join(F.broadcast(cand_df), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * k >= n)
    )
    assert {r.value: r.freq for r in recount.collect()} == batch == {"hot": 300}


def test_evicted_candidates_leave_the_latest_summary(spark, tmp_path):
    """A value evicted by a later shrink must NOT survive a latest-seq
    read (update mode cannot retract, so the seq stamp carries the
    'current summary' boundary): capacity 2, batch 1 dominated by A/B,
    batch 2 dominated by E/F -> the final summary holds E/F only."""
    rows1 = [(i, v) for i, v in enumerate(["A"] * 5 + ["B"] * 4 + ["C"] * 3)]
    rows2 = [(100 + i, v) for i, v in enumerate(["E"] * 10 + ["F"] * 9 + ["G"] * 8)]
    src = tmp_path / "hh2_src"
    src.mkdir()
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        heavy_hitters_stream(stream, "value", capacity=2, shards=1)
        .writeStream.format("memory")
        .queryName("hh2_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh2_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM hh2_out").collect()
    top_seq = max(r.seq for r in rows)
    current = {r.value: r.est for r in rows if r.seq == top_seq}
    assert len(current) <= 2  # the documented bound holds for the reader
    assert "E" in current and "A" not in current
    # naive last-per-(shard,value) over ALL seqs would exceed capacity —
    # exactly why the reader contract is latest-seq, not latest-row
    naive = {r.value for r in rows}
    assert len(naive) > 2
