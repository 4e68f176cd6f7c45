"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the part that matters at 100 TB):

- exact dedup: hash-groupBy on a 128-bit content hash — one shuffle keyed
  by the hash, min-id representative via min_by; never a pairwise compare.
- n-gram Jaccard: pairwise — only usable inside small candidate blocks.
  `jaccard_pairs` therefore REQUIRES a blocking key; the all-pairs
  explosion is structurally impossible to write with it.
- MinHash+LSH: signatures are per-row (no shuffle), banding explodes each
  row into n_bands rows, the bucket join is a shuffle on (band, bucket
  hash) — the classic linear-ish near-dup pipeline. Candidate pairs are
  then verified with exact Jaccard, so LSH only affects recall, never
  precision.
- SimHash: 64-bit signature per row; near-dup candidates = equal signature
  bands (4×16-bit tables) — same banding trick, Hamming verify after.

All hashing derives from xxhash64/md5 with explicit integer seeds —
deterministic across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from notion_spark.pipeline.text_analysis import ws_tokens


# ------------------------------------------------------------ shingling
def token_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram token shingles (space-joined)."""
    toks = ws_tokens(col)
    k = F.size(toks) - (n - 1)
    grams = F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(grams)


# ------------------------------------------------------------ exact dedup
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash; keeps the minimum-id row as
    the canonical representative. Output: (id, n_dups) for each canonical
    row. One shuffle, map-side combined."""
    h = F.md5(F.col(text_col))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Dataset with exact duplicates removed (canonical = min id).
    min_by keyed on the hash — one shuffle, no join back when the full row
    is small; for wide rows use a semi-join against the canonical ids."""
    canon = exact_dedup(df, text_col, id_col).select(F.col("canonical_id").alias(id_col))
    return df.join(canon, on=id_col, how="left_semi")


# ------------------------------------------------------------ exact Jaccard
def jaccard_pairs(
    df: DataFrame,
    block_key: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs WITHIN a blocking key.

    The blocking key is mandatory: pairwise similarity without blocking is
    O(N²) and cannot survive scale. Output: (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= threshold, rounded to 6 places.
    """
    docs = df.select(
        block_key.alias("block"), F.col(id_col).alias("id"), token_shingles(text_col, n).alias("sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(b, on=[F.col("a.block") == F.col("b.block"), F.col("a.id") < F.col("b.id")])
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), jac.alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ MinHash + LSH
def _affine_consts(i: int) -> tuple[int, int]:
    """Deterministic odd multiplier + offset for permutation i (splitmix64
    golden-ratio constants), wrapped to signed 64-bit."""

    def signed(x: int) -> int:
        x &= 0xFFFFFFFFFFFFFFFF
        return x - (1 << 64) if x >= (1 << 63) else x

    a = signed(0x9E3779B97F4A7C15 * (2 * i + 1))
    b = signed(0xBF58476D1CE4E5B9 * (i + 1))
    return a | 1, b


def minhash_signature(col: Column | str, num_hashes: int = 64, ngram: int = 3) -> Column:
    """MinHash signature via the one-hash + affine-permutation scheme:
    each shingle is xxhash64'd ONCE, then permutation i is the wrap-around
    affine map h*a_i + b_i (odd a_i ⇒ bijective mod 2^64). 64× cheaper
    than re-hashing strings per permutation, identical collision
    statistics. Entirely JVM-side; no UDF, no shuffle."""
    sh = token_shingles(col, ngram)
    base = F.transform(sh, lambda s: F.xxhash64(s))
    mins = []
    for i in range(num_hashes):
        a, b = _affine_consts(i)
        mins.append(F.array_min(F.transform(base, lambda h: h * F.lit(a) + F.lit(b))))
    return F.array(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` rows keyed by
    (band_idx, hash(band slice)); docs sharing any band bucket become a
    candidate pair. rows_per_band = num_hashes/bands controls the
    similarity knee (16 bands × 4 rows ⇒ ~0.5-0.6 Jaccard knee).

    Output: distinct (id_a, id_b) candidates, id_a < id_b. The shuffle key
    is the band bucket — high cardinality, no skew by construction.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # Explode shingles to rows, hash each ONCE, then build the signature as
    # 64 min-aggregates over affine permutations — a single map-side
    # combined shuffle on the doc id. (The all-in-one-expression variant
    # blows past the codegen method-size limit and falls back to
    # interpreted eval — ~50× slower.)
    exploded = (
        df.filter(F.size(ws_tokens(text_col)) >= ngram)
        .select(F.col(id_col).alias("id"), F.explode(token_shingles(text_col, ngram)).alias("s"))
        .select("id", F.xxhash64("s").alias("h"))
    )
    mins = []
    for i in range(num_hashes):
        a, b = _affine_consts(i)
        mins.append(F.min(F.col("h") * F.lit(a) + F.lit(b)).alias(f"m{i}"))
    sig = exploded.groupBy("id").agg(*mins)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.col(f"m{b * r + j}").cast("string") for j in range(r)])).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.bucket") == F.col("y.bucket"),
                F.col("x.id") < F.col("y.id"),
            ],
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify.
    Output matches `jaccard_pairs` (id_a, id_b, jaccard ≥ threshold), so
    LSH recall is measurable against the exact blocked variant."""
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, ngram)
    docs = df.select(F.col(id_col).alias("id"), token_shingles(text_col, ngram).alias("sh"))
    j = (
        cands.join(docs.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(docs.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6)
    return j.select("id_a", "id_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------ SimHash
def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens: sum ±1 per bit of each
    token's xxhash64, sign -> bit. Native bit algebra via shiftright/&1 —
    no UDF. Returns a signed 64-bit signature."""
    toks = ws_tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bits = []
    for i in range(64):
        # count of tokens with bit i set, minus count with bit i unset
        set_cnt = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int"),
        )
        bit = (set_cnt * 2 > F.size(toks)).cast("long")
        bits.append(F.shiftleft(bit, i))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", band_bits: int = 16
) -> DataFrame:
    """Near-dup candidates: equal 16-bit band of the SimHash (4 tables).
    Docs within Hamming distance 3 share at least one of 4 bands
    (pigeonhole). Output: distinct candidate (id_a, id_b)."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig"))
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    x, y = banded.alias("x"), banded.alias("y")
    ham = _popcount64(F.col("x.sig").bitwiseXOR(F.col("y.sig")))
    return (
        x.join(
            y,
            on=[
                F.col("x.band") == F.col("y.band"),
                F.col("x.bucket") == F.col("y.bucket"),
                F.col("x.id") < F.col("y.id"),
            ],
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), ham.alias("hamming"))
        .distinct()
    )


def _popcount64(c: Column) -> Column:
    """Portable popcount via bin()+char counting (bit_count exists in
    Spark 3.2+ as F.bit_count; keep fallback-free and use it)."""
    return F.bit_count(c)


# --------------------------------------------------- embedding near-dup
def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_key: Column | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicates. With no ``block_key`` this is
    all-pairs — fine for ≤~10^5 rows per executor-memory budget; at scale
    pass an LSH/IVF bucket (see similarity.random_hyperplane_bucket)."""
    from notion_spark.pipeline.similarity import cosine

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if block_key is not None:
        v = v.withColumn("block", block_key)
    a, b = v.alias("a"), v.alias("b")
    cond = [F.col("a.id") < F.col("b.id")]
    if block_key is not None:
        cond.append(F.col("a.block") == F.col("b.block"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(b, on=cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
