"""Training-pipeline reshaping + sketches.

Split from parity.py (r11); oracle text moved byte-identical.
"""

from notion_spark.parity._base import *  # noqa: F401,F403

# =====================================================================
# Training-pipeline reshaping + sketches (round 2)
# =====================================================================


@register(
    "scd2_status_intervals",
    """
    WITH h AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               lag(o_orderstatus) OVER w AS prev,
               row_number() OVER w AS rn
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    c AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        FROM h
        WHERE rn = 1 OR o_orderstatus IS DISTINCT FROM prev
    )
    SELECT o_custkey, o_orderstatus,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(o_orderdate) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
           lead(o_orderdate) OVER w2 IS NULL AS is_current
    FROM c
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_status_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals over each customer's order-status
    history (operators/incremental.scd2_intervals): consecutive
    same-status rows collapse; each surviving change carries
    [valid_from, valid_to) with valid_to = next change's timestamp."""
    from notion_spark.operators.incremental import scd2_intervals

    o = read_table(spark, sf_dir, "orders")
    out = scd2_intervals(o, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "o_custkey",
        "o_orderstatus",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        "is_current",
    )


@register(
    "chunk_token_windows",
    r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    c AS (
        SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id AS id,
           CAST((s - 1) // 24 AS INT) AS chunk_id,
           CAST(s AS INT) AS start_token,
           CAST(len(t[s : s + 31]) AS INT) AS n_tokens,
           array_to_string(t[s : s + 31], ' ') AS chunk_text
    FROM c
    """,
)
def chunk_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token windows (size 32, stride 24) per
    document — the retrieval/embedding-index reshaping
    (pipeline/chunking.chunk_documents). Pure narrow explode, no
    shuffle."""
    from notion_spark.pipeline.chunking import chunk_documents

    d = read_table(spark, sf_dir, "documents")
    return chunk_documents(d, size=32, stride=24)


@register(
    "pack_sequence_offsets",
    r"""
    WITH base AS (
        SELECT doc_id AS id, source AS shard,
               CAST(len(list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    s AS (
        -- CAST: DuckDB's SUM(BIGINT) window is HUGEINT (float64 in
        -- pandas); the driver hashes by value kind, so 5.0 vs Spark's
        -- int64 5 would hash-fail despite equal values
        SELECT id, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY id
                                        ROWS UNBOUNDED PRECEDING) - n_tokens
                    AS BIGINT) AS start_offset
        FROM base
    )
    SELECT id, shard, n_tokens, start_offset,
           start_offset // 256 AS pack_first,
           (start_offset + greatest(n_tokens - 1, 0)) // 256 AS pack_last,
           start_offset // 256 <> (start_offset + greatest(n_tokens - 1, 0)) // 256
               AS spans_boundary
    FROM s
    """,
)
def pack_sequence_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-split sequence packing (budget 256 tokens) over
    the documents corpus, sharded by source
    (pipeline/chunking.pack_sequences): per-shard running-sum window
    gives every document its stream offset and pack range."""
    from notion_spark.pipeline.chunking import pack_sequences

    d = read_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=256, shard_col="source")


@register(
    "sketch_kmv_users",
    """
    WITH h AS (
        SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                             AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    k AS (SELECT h FROM h ORDER BY h LIMIT 256)
    SELECT CAST(256 AS INT) AS k_used,
           CAST(COUNT(*) AS BIGINT) AS n_minima,
           MAX(h) AS kth_hash,
           round(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                      ELSE 255 * 1152921504606846976.0 / MAX(h) END, 2) AS est_distinct,
           COUNT(*) < 256 AS is_exact
    FROM k
    """,
)
def sketch_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch over events, rebuilt value-for-value by
    the oracle from the same engine-neutral md5-prefix hash
    (pipeline/sketches.kmv_distinct). TakeOrderedAndProject keeps only
    k minima per partition — no global sort."""
    from notion_spark.pipeline.sketches import kmv_distinct

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id")
    )
    return kmv_distinct(ev, "user_id", k=256)


@register(
    "sketch_hll_users",
    """
    WITH h AS (
        SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT h >> 52 AS bucket,
               MAX(CASE WHEN (h & 4503599627370495) = 0 THEN 53
                        ELSE 53 - length(bin(h & 4503599627370495)) END) AS rho
        FROM h GROUP BY bucket
    )
    SELECT CAST(256 AS INT) AS m,
           CAST(256 - COUNT(*) AS BIGINT) AS n_empty_registers,
           CAST(SUM(CAST(1 AS BIGINT) << (54 - rho))
                + (256 - COUNT(*)) * 18014398509481984 AS BIGINT) AS harmonic_scaled,
           round(CASE WHEN ((0.7213 / (1 + 1.079 / 256)) * 256 * 256 * 18014398509481984.0)
                           / (SUM(CAST(1 AS BIGINT) << (54 - rho))
                              + (256 - COUNT(*)) * 18014398509481984) <= 640.0
                       AND 256 - COUNT(*) > 0
                      THEN 256.0 * ln(256.0 / (256 - COUNT(*)))
                      ELSE ((0.7213 / (1 + 1.079 / 256)) * 256 * 256 * 18014398509481984.0)
                           / (SUM(CAST(1 AS BIGINT) << (54 - rho))
                              + (256 - COUNT(*)) * 18014398509481984)
                      END, 2) AS est_distinct
    FROM r
    """,
)
def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (p=8) distinct-user estimate whose registers AND
    scaled-integer harmonic sum the oracle recomputes exactly — the
    float division happens once, on two identical integers, so the
    estimate matches to the bit (pipeline/sketches.hll_distinct)."""
    from notion_spark.pipeline.sketches import hll_distinct

    ev = read_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id")
    )
    return hll_distinct(ev, "user_id", p=8)


