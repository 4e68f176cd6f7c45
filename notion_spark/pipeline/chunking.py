"""Document chunking and sequence packing — the two reshaping steps
between a cleaned corpus and a training loader.

- `chunk_documents`: split each document into fixed-size token windows
  with a configurable stride (overlap) — the retrieval/embedding-index
  shape. Pure explode: one output row per window, no shuffle at all
  (narrow map over the corpus scan).
- `pack_sequences`: concatenate-then-split packing — documents are laid
  end-to-end into a token stream per shard and the stream is cut into
  fixed ``budget``-token blocks (the GPT-style pretraining layout). Each
  document learns its stream offset and the block range it lands in via
  ONE running-sum window per shard; shards process in parallel, so the
  sequential prefix-sum never becomes a single global task.

Both are native column expressions end to end (split / slice /
posexplode / window sum) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.pipeline.text_analysis import ws_tokens


def chunk_documents(
    df: DataFrame,
    size: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token windows per document.

    Window i covers tokens [1 + i·stride, 1 + i·stride + size); the last
    window may be shorter (every token belongs to >= 1 window; nothing is
    dropped). ``stride`` defaults to ``size`` (disjoint chunks); a
    smaller stride produces overlapping chunks for retrieval indexes.
    Documents with no tokens produce no rows.

    Output: (id, chunk_id, start_token, n_tokens, chunk_text), one row
    per window. chunk_id is 0-based, start_token 1-based.
    """
    stride = size if stride is None else stride
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")
    toksed = df.select(
        F.col(id_col).alias("id"), ws_tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") > 0)
    starts = F.sequence(F.lit(1), F.size("t"), F.lit(stride))
    exploded = toksed.select("id", "t", F.posexplode(starts).alias("chunk_id", "start_token"))
    chunk = F.slice(F.col("t"), F.col("start_token"), size)
    return exploded.select(
        "id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_token").cast("int").alias("start_token"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenate-then-split packing: per shard, documents are ordered
    by id, laid end-to-end into a token stream, and the stream is cut
    into consecutive ``budget``-token packs. Each document reports where
    it landed:

    (id, shard, n_tokens, start_offset, pack_first, pack_last,
     spans_boundary)

    - start_offset: 0-based position of the document's first token in
      its shard's stream;
    - pack_first / pack_last: the pack indices of its first and last
      token (a document longer than the tail of its pack spans several —
      spans_boundary flags it, the loader's signal to split or mask);
    - empty documents occupy zero tokens: they sit AT their offset with
      pack_last = pack_first and spans_boundary false.

    One window (running sum) per shard; shards are independent, so the
    inherently sequential prefix-sum parallelizes across the shard key.
    At 100 TB use a composite shard key (e.g. source × hash-bucket) so
    no single shard's stream serializes on one task.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        F.size(ws_tokens(F.coalesce(F.col(text_col), F.lit("")))).cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    sized = base.select("id", "shard", "n_tokens", (cum - F.col("n_tokens")).alias("start_offset"))
    pack_first = F.floor(F.col("start_offset") / budget)
    last_tok = F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    pack_last = F.floor(last_tok / budget)
    return sized.select(
        "id",
        "shard",
        "n_tokens",
        "start_offset",
        pack_first.alias("pack_first"),
        pack_last.alias("pack_last"),
        (pack_first != pack_last).alias("spans_boundary"),
    )
