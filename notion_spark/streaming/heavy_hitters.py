"""Streaming heavy hitters — continuous Misra-Gries candidate summaries.

The streaming analogue of `pipeline.sketches.heavy_hitters`' first pass:
the stream is sharded by value hash, each shard carries a bounded
Misra-Gries counter dict (at most ``capacity`` entries) across
micro-batches with applyInPandasWithState, and every micro-batch emits
the shard's refreshed candidate summary in update mode, stamped with a
per-shard ``seq`` number. Update mode cannot retract rows, so a value
EVICTED by a later shrink would linger in the sink with a stale
estimate; readers must therefore keep only each shard's LATEST
emission — ``filter(seq == max(seq) over shard)`` — which is exactly
the full current summary. That read gives a candidate set that is a
SUPERSET of every value with true frequency > n/(capacity+1) — the
same guarantee the batch operator's pass 1 gives, continuously — and
at most shards x capacity rows.

Why shard instead of one global state group: state in
applyInPandasWithState lives per group key, and a single key would
funnel the whole stream through one task. Hash-sharding keeps the
per-shard state bounded (capacity entries) while spreading the scan;
the per-shard undercount bound composes additively, exactly like the
per-partition bound of `mg_partition_summaries` (sketches.py).

State is two parallel arrays (values, estimates), at most ``capacity``
long — memory-bounded regardless of stream length or key cardinality.
Exact recount of the candidates (batch pass 2) runs against the store
on demand; false negatives are structurally impossible at the bound.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from notion_spark.pipeline.sketches import _mg_shrink

_STATE_SCHEMA = "seq int, vals array<string>, ests array<bigint>"


def heavy_hitters_stream(
    stream: DataFrame,
    col: str,
    capacity: int = 64,
    shards: int = 8,
) -> DataFrame:
    """(shard, seq, value, est) candidate updates per micro-batch; every
    batch re-emits the shard's WHOLE current summary under a fresh seq,
    so the latest seq per shard is self-contained (see module docstring
    for the reader contract). ``capacity`` bounds the state and each
    emission; the latest-seq candidate set is at most shards x capacity
    rows. Values ride as strings (the one representation every key type
    round-trips through Arrow losslessly — float NaN cannot, see
    mg_partition_summaries)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    src = stream.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("value"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
    )
    out_schema = "shard int, seq int, value string, est bigint"

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            seq, vals, ests = state.get
            counts: dict = dict(zip(vals, ests))
        else:
            seq, counts = 0, {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            for v, c in pdf["value"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            # shrink per Arrow batch: the dict stays <= capacity +
            # batch-distinct in between, never the stream's cardinality
            _mg_shrink(counts, capacity)
        seq += 1
        state.update((seq, list(counts.keys()), [int(x) for x in counts.values()]))
        if counts:
            yield pd.DataFrame(
                {
                    "shard": [shard] * len(counts),
                    "seq": [seq] * len(counts),
                    "value": list(counts.keys()),
                    "est": [int(x) for x in counts.values()],
                }
            )

    return src.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
