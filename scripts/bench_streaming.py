#!/usr/bin/env python
"""Micro-batch wall-clock bench for the streaming operators (guide
§1.1: an "optimize every operator" brief needs a measured surface; the
batch bench cannot time a foreachBatch/applyInPandasWithState path).

Method: the sf events/documents tables are split DETERMINISTICALLY
into N parquet micro-batch files once per run; each operator then
consumes them as a file-source stream with maxFilesPerTrigger=1 under
an availableNow trigger — N real micro-batches through the operator's
actual state machinery — into a noop sink (stateless/stateful
transforms) or the operator's own store (matview/upsert, whose write
IS the operator). Per-operator seconds are the median of
$SPARK_GRAFT_BENCH_ITERS (default 3) full passes, each from a FRESH
checkpoint so every pass replays all N batches.

Prints ONE JSON line: {"metric": "notion-spark streaming micro-batch
wall time", "value": total, "unit": "sec", "operators": {...},
"n_batches": N, "sf": ...} — the committed STREAM_BENCH_r{N}.json
artifact. This is a separate surface from bench.py (the driver's
contract there is untouched).

Usage: python scripts/bench_streaming.py [--json OUT] [n_batches]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ITERS
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _split_batches(spark, src: str, out_dir: str, n: int, key: str) -> str:
    """Write n deterministic micro-batch files b0..b{n-1}."""
    df = spark.read.parquet(src)
    for i in range(n):
        part = df.filter(F.pmod(F.xxhash64(F.col(key)), F.lit(n)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{i}")
        )
    return os.path.join(out_dir, "*")


def _drain(q) -> None:
    q.awaitTermination()


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    n_batches = int(argv[0]) if argv else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from notion_spark.session import BENCH_DRIVER_MEMORY_CONF, get_spark
    from notion_spark.streaming.dedup import dedup_stream
    from notion_spark.streaming.heavy_hitters import heavy_hitters_stream
    from notion_spark.streaming.matview import stream_refresh
    from notion_spark.streaming.sessions import session_aggregates, sessionize_stream
    from notion_spark.streaming.upsert import stream_upsert

    spark = get_spark(
        app_name="notion-spark-streaming-bench",
        extra_conf={"spark.ui.enabled": "false", **BENCH_DRIVER_MEMORY_CONF},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    ev_glob = _split_batches(
        spark, os.path.join(sf_dir, "events.parquet"),
        os.path.join(work, "events"), n_batches, "event_id",
    )
    # documents get a synthetic event-time column (deterministic from
    # doc_id) so the watermarked dedup path exercises its state eviction
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "ts",
        (F.lit(1735689600) + F.pmod(F.col("doc_id"), F.lit(86400)))
        .cast("timestamp"),
    )
    docs_dir = os.path.join(work, "documents")
    for i in range(n_batches):
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == i).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(docs_dir, f"b{i}"))
    docs_glob = os.path.join(docs_dir, "*")
    ev_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    docs_schema = docs.schema

    def reader(glob_path: str, schema):
        df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(glob_path)
        )
        # parquet-written naive timestamps arrive TIMESTAMP_NTZ, which
        # watermarks/state ops reject; session tz is UTC so the cast is
        # value-preserving (the sessionize_batch convention)
        if "ts" in df.columns:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    def run_noop(make_df, mode: str = "append") -> None:
        ckpt = tempfile.mkdtemp(prefix="ckpt_", dir=work)
        q = (
            make_df()
            .writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        shutil.rmtree(ckpt, ignore_errors=True)

    def bench(name: str, fn) -> float:
        runs = []
        for _ in range(iters):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        results[name] = round(med, 3)
        spread[name] = [runs[0], runs[-1]]
        return med

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}

    bench(
        "streaming_dedup",
        lambda: run_noop(
            lambda: dedup_stream(
                reader(docs_glob, docs_schema), "text", event_col="ts",
                watermark="1 day",
            )
        ),
    )
    bench(
        "streaming_sessionize",
        lambda: run_noop(
            lambda: sessionize_stream(reader(ev_glob, ev_schema), "user_id", "ts")
        ),
    )
    bench(
        "streaming_session_aggregates",
        lambda: run_noop(
            lambda: session_aggregates(
                reader(ev_glob, ev_schema).withWatermark("ts", "1 day"),
                "user_id", "ts", value_col="value",
            )
        ),
    )
    bench(
        "streaming_heavy_hitters",
        lambda: run_noop(
            lambda: heavy_hitters_stream(reader(ev_glob, ev_schema), "user_id"),
            mode="update",
        ),
    )

    def run_matview() -> None:
        store = os.path.join(work, "mv_store")
        ckpt = os.path.join(work, "mv_ckpt")
        for p in (store, ckpt):
            shutil.rmtree(p, ignore_errors=True)
        q = stream_refresh(
            reader(ev_glob, ev_schema).select("event_type", "value"),
            store, ckpt, keys=["event_type"], sums=["value"],
        )
        _drain(q)

    bench("streaming_matview_refresh", run_matview)

    def run_upsert() -> None:
        store = os.path.join(work, "up_store")
        ckpt = os.path.join(work, "up_ckpt")
        for p in (store, ckpt):
            shutil.rmtree(p, ignore_errors=True)
        q = stream_upsert(
            reader(ev_glob, ev_schema).select("user_id", "event_type", "ts"),
            store, ckpt, key="user_id", order_by_cols=["ts"],
        )
        _drain(q)

    bench("streaming_upsert", run_upsert)

    shutil.rmtree(work, ignore_errors=True)
    total = round(sum(results.values()), 3)
    line = json.dumps(
        {
            "metric": "notion-spark streaming micro-batch wall time",
            "value": total,
            "unit": "sec",
            "operators": results,
            "spread": spread,
            "n_batches": n_batches,
            "iters": iters,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    print(line)
    if json_out:
        with open(json_out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
