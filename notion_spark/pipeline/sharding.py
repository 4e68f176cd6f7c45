"""Dataset sharding & deterministic shuffle — the publishing tail of a
training-data pipeline.

- `with_shard`: stable hash-shard assignment (xxhash64 of the id + seed),
  independent of partition layout or cluster size — re-running on any
  cluster yields byte-identical shard membership.
- `deterministic_shuffle`: global pseudo-random row order keyed by the
  same hash — the "shuffle the corpus before training" step, reproducible
  across runs (never use rand(): partition-dependent).
- `write_training_shards`: one directory per shard, rows pre-shuffled
  within each; `maxRecordsPerFile` bounds file sizes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shard(df: DataFrame, id_col: str, n_shards: int, seed: int = 42, out: str = "shard") -> DataFrame:
    """Stable shard id in [0, n_shards) from xxhash64(id, seed)."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast("int"))


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """Global reproducible pseudo-random order (sort by keyed hash).
    One range-partitioned sort — the unavoidable cost of a true global
    shuffle; for shard-local shuffling prefer write_training_shards."""
    return df.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 42,
    max_records_per_file: int = 100_000,
) -> None:
    """Hash-shard + shard-local shuffle + partitioned parquet write.

    repartition(n, shard) co-locates each shard; sortWithinPartitions by
    the row hash shuffles rows within it without a second exchange."""
    sharded = with_shard(df, id_col, n_shards, seed)
    (
        sharded.repartition(n_shards, "shard")
        # leading 'shard' satisfies the dynamic-partition writer's required
        # ordering (otherwise it inserts a SECOND per-task sort and the
        # intra-shard order would ride on that sort's stability)
        .sortWithinPartitions("shard", F.xxhash64(F.col(id_col), F.lit(seed + 1)))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
