"""Streaming incremental materialized view — the continuous analogue of
operators/matview.

Batch `refresh` folds one batch into the state; this wires the SAME
merge (operators.matview.merge_states — count/sum/min/max monoids over
DECIMAL-exact sums) into Structured Streaming via foreachBatch, so a
view over an unbounded source stays current at per-micro-batch cost:

    state' = merge_states(state, build_state(micro_batch))

Why foreachBatch and not a plain streaming groupBy agg: the built-in
streaming aggregate keeps ALL group state in the state store and cannot
emit a queryable table without `complete` mode (which re-emits every
group every trigger). Here the state lives in a parquet store (the
dependency-free stand-in for a Delta MERGE target, same as
streaming/upsert.py), micro-batches touch only their own groups'
partials, and any reader sees a consistent view between triggers.

Exactly-once: the merge is idempotent per epoch only if each batch is
processed once — the checkpoint gives that; a REPLAYED batch would
double-count (sums are not idempotent, unlike upsert's keep-last), so
`stream_refresh` records the last merged epoch in the store and skips
epochs it has already folded (the standard foreachBatch transactional
guard)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from notion_spark.operators.matview import build_state, merge_states


def _epoch_path(store_path: str) -> str:
    # INSIDE the store directory (underscore-prefixed files are ignored
    # by Spark's parquet reader, like _SUCCESS) so the directory swap
    # commits state and epoch marker in ONE atomic rename — a marker
    # beside the store would leave a crash window between the two
    # writes in which a replayed batch double-counts.
    return os.path.join(store_path, "_epoch.json")


def _recover(store_path: str) -> None:
    """Finish an interrupted swap: a crash between rmtree(store) and
    rename(tmp, store) leaves no store but a COMPLETE tmp (its epoch
    marker is written before the swap starts). Promoting it is always
    safe — tmp only ever holds a fully written merged state. Without
    this, a replayed batch would rebuild the view from itself and every
    previously merged epoch would silently vanish."""
    tmp = store_path + ".tmp"
    if (
        not os.path.exists(store_path)
        and os.path.isdir(tmp)
        and os.path.exists(os.path.join(tmp, "_epoch.json"))
    ):
        os.rename(tmp, store_path)


def last_epoch(store_path: str) -> int:
    _recover(store_path)
    p = _epoch_path(store_path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)["epoch"]
    return -1


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    epoch: int,
    store_path: str,
    keys: list[str],
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
) -> None:
    """Fold one micro-batch into the parquet state store, once per epoch
    (replays are skipped — merging counts twice would double them).
    The epoch marker rides inside the swapped directory, so state and
    marker commit atomically: a crash anywhere leaves either the old
    store+epoch or the new store+epoch, never a mix."""
    import shutil

    if epoch <= last_epoch(store_path):
        return
    spec = dict(keys=keys, sums=list(sums), mins=list(mins), maxs=list(maxs))
    part = build_state(batch, **spec)
    if os.path.exists(store_path):
        merged = merge_states(spark.read.parquet(store_path), part, **spec)
    else:
        merged = part
    # tmp-then-swap: merged's lineage reads store_path (see upsert.py);
    # the epoch marker is written into tmp BEFORE the atomic rename
    tmp = store_path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_epoch.json"), "w") as f:
        json.dump({"epoch": epoch}, f)
    if os.path.exists(store_path):
        shutil.rmtree(store_path)
    os.rename(tmp, store_path)


def stream_refresh(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    keys: list[str],
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
    trigger_once: bool = True,
) -> StreamingQuery:
    """Attach the incremental-view merge to a streaming frame. The store
    at ``store_path`` always equals `build_state` of everything consumed
    so far — pinned by the batch==stream equivalence test.

    The store and the checkpoint share a lifecycle: epoch ids restart
    from 0 with a FRESH checkpoint, so pointing a new checkpoint at an
    old store would silently skip the first batches (guard sees stale
    epochs). Recreate (or relocate) both together."""

    def run(batch: DataFrame, epoch: int) -> None:
        merge_batch(
            batch.sparkSession, batch, epoch, store_path, keys, sums, mins, maxs
        )

    writer = stream.writeStream.foreachBatch(run).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
