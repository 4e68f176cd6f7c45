"""Hashed-feature linear classifier inference at corpus scale.

The fastText-style "score every document with a small linear model"
pass that modern curation pipelines run over the whole corpus (domain
routing, educational-quality filtering, topic tagging). The model here
is the hashing-trick bag-of-words linear form: token → stable hash
bucket, document → sparse (bucket, count) vector, class score =
Σ count·weight over a (|classes| × n_buckets) integer weight table.

Spark-first shape — the model is tiny, the corpus is huge:

- inference is one explode to tokens (linear in corpus tokens), a
  map-side-combined (doc, bucket) count, a **broadcast** join against
  the weight table (|classes|·n_buckets rows, megabytes at most), and
  one more map-side-combined (doc, class) sum; the argmax resolves
  over a |classes|-bounded per-doc frame. Nothing anywhere is
  corpus×corpus and the only shuffles key on (doc, bucket)/(doc,
  class) — both grow linearly with the corpus and skew no worse than
  document length.
- training (`train_class_weights`) is the same single token pass
  aggregated to the bounded (class, bucket) grid: per-class relative
  bucket frequency in half-up micro-units (exact DECIMAL(38,0)
  algebra via functions/exactmath — no float accumulation, so weights
  and scores are engine-exact and the whole flow hash-checks against
  a DuckDB oracle; see parity.py `text_hashed_classifier`).

Weights are plain integers, so scores are exact: a document of L
tokens scores at most L·10⁶ per class — int64-safe for any document
below ~9·10¹² tokens (not a real document).

Default hasher is `md5_hash60` for oracle parity; production callers
on one engine can pass `F.xxhash64` for speed (same plan shape).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.functions.exactmath import halfup_micro_div_cols
from notion_spark.pipeline.text_analysis import md5_hash60, ws_tokens


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    hasher: Callable[[Column], Column] = md5_hash60,
) -> DataFrame:
    """Sparse hashed bag-of-words: one row per (id, bucket) with the
    token count — the hashing-trick feature map (Weinberger et al.
    2009). `md5_hash60` is non-negative, so `pmod` ≡ DuckDB `%`."""
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("__tok")
    )
    return toks.groupBy(
        id_col, F.pmod(hasher(F.col("__tok")), F.lit(n_buckets)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def train_class_weights(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    hasher: Callable[[Column], Column] = md5_hash60,
) -> DataFrame:
    """(label, bucket, weight) — per-class relative bucket frequency in
    half-up micro-units: weight = round₆(class bucket tokens / class
    total tokens)·10⁶ as BIGINT. A multinomial class profile (the
    log-free cousin of naive Bayes): length-normalizing by the class
    total keeps a big class from outscoring everything merely by
    volume. One token pass, aggregated to the bounded
    |classes|×n_buckets grid; the class totals join is |classes| rows,
    broadcast.

    NULL labels mean "unlabeled" and are EXCLUDED from the model
    (filtered explicitly — without the filter they would fall out
    silently at the totals equi-join). Treat missing-label as its own
    class by coalescing the label column first if that is the intent."""
    toks = df.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        F.explode(ws_tokens(F.col(text_col))).alias("__tok"),
    )
    per_bucket = toks.groupBy(
        "label", F.pmod(hasher(F.col("__tok")), F.lit(n_buckets)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("ccnt"))
    totals = per_bucket.groupBy("label").agg(F.sum("ccnt").alias("ctot"))
    return (
        per_bucket.join(F.broadcast(totals), "label")
        .select(
            "label",
            "bucket",
            halfup_micro_div_cols("ccnt", "ctot").alias("weight"),
        )
    )


def classifier_scores(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, score) for every document × class with any feature
    overlap: score = Σ cnt·weight, exact BIGINT. The weight table
    broadcasts (it is bounded by |classes|·n_buckets regardless of
    corpus size); the per-(doc, class) sum is map-side combined."""
    return (
        features.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("cnt") * F.col("weight")).alias("score"))
    )


def classify(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    hasher: Callable[[Column], Column] = md5_hash60,
) -> DataFrame:
    """(id, label, score): the argmax class per document — determinate
    ties resolve to the lexicographically smallest label. Documents
    with no tokens (or no bucket present in the model) get no row —
    route them explicitly rather than defaulting a class silently.

    The argmax window partitions by document over a frame bounded by
    |classes| rows per document — never a global sort."""
    feats = hashed_token_features(df, text_col, id_col, n_buckets, hasher)
    scored = classifier_scores(feats, weights, id_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
