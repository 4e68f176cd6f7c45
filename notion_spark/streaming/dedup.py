"""Streaming exact deduplication (the continuous analogue of
pipeline/dedup.exact_dedup, for ingest-time dedup of a document stream).

Two state regimes:

- ``event_col`` + watermark: `dropDuplicatesWithinWatermark` — state per
  content hash is dropped once the watermark passes it, so memory is
  bounded by the duplicate-arrival horizon, not the corpus. This is the
  only shape that survives an unbounded 100 TB/day ingest: duplicates in
  real pipelines arrive clustered (re-crawls, retries), so a horizon of
  hours/days catches them while keeping state finite.
- no event column: `dropDuplicates` on the hash — exact all-time dedup,
  state grows with distinct-content cardinality. Correct, but reserve it
  for bounded backfills.

Near-dup (MinHash) dedup intentionally has NO streaming form here: LSH
banding needs corpus-global signatures, so the scalable continuous
design is exact-hash dedup at ingest + periodic batch near-dup compaction
over the store (run pipeline/dedup.minhash_dedup_pairs on a schedule) —
documented rather than faked with an unbounded-state operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    event_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Content-hash exact dedup over a (possibly streaming) frame. The
    same expression works on a batch frame, which is what the
    stream==batch equivalence test exploits."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if event_col is not None:
        return hashed.withWatermark(event_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])
