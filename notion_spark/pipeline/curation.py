"""Training-data curation operators: benchmark decontamination, PII
redaction, and deterministic stratified sampling.

All native column expressions / joins — no Python in any hot path, every
pairwise step is bounded by a join on high-cardinality gram hashes or a
broadcast of the (small) benchmark side, so each op keeps its shape at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from notion_spark.pipeline.dedup import shingle_hashes


# ------------------------------------------------------- decontamination
def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """Corpus documents that share >= ``min_shared`` distinct n-grams with
    ANY benchmark document — the standard benchmark-decontamination test
    (13-gram overlap in GPT-3/PaLM data cards; ``n`` is configurable
    because short-document corpora need smaller grams).

    Scale shape: both sides reduce to (id, gram-hash) streams; the
    benchmark side is distinct-ed and tiny, so Spark broadcasts it and
    the corpus stream never shuffles BEFORE the join — duplicate grams
    within a doc ride through the (map-side) broadcast join and are
    deduped by the count_distinct aggregate, whose partial aggregation
    collapses them before the only shuffle (on doc id, post-filter-sized).
    The corpus is never collected or pairwise-joined.
    Output: (doc_id, shared_grams = distinct shared n-grams).
    """
    c = shingle_hashes(corpus, text_col, id_col, n)
    b = shingle_hashes(benchmark, text_col, id_col, n).select("h").distinct()
    return (
        c.join(b, "h")  # benchmark side is small -> AQE broadcasts it
        .groupBy("id")
        .agg(F.count_distinct("h").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
        .select(F.col("id").alias(id_col), "shared_grams")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs (anti-join on the flagged ids)."""
    flagged = contaminated_ids(corpus, benchmark, n, text_col, id_col, min_shared)
    return corpus.join(flagged.select(id_col), id_col, "left_anti")


# ------------------------------------------------------------ PII redaction
# Conservative RE2-compatible patterns (identical semantics in Spark's
# Java regex and DuckDB's RE2 — no lookarounds, no dialect-specific
# classes) so redaction is oracle-checkable cross-engine.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(col: Column | str) -> Column:
    """Chained regexp_replace over PII_PATTERNS (order matters: emails
    before phones so user-123-456-7890@x.y is an email, SSN/phone before
    IPv4 so dotted phone forms don't half-match). Single codegen'd
    Project — runs at scan speed."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_hits(col: Column | str) -> dict[str, Column]:
    """Per-category hit counts (pre-redaction) for audit dashboards."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))
        for name, pattern, _ in PII_PATTERNS
    }


# ------------------------------------------------- deterministic sampling
def hash_bucket(col: Column | str, buckets: int = 10_000) -> Column:
    """Engine-neutral deterministic bucket in [0, buckets): the shared
    60-bit md5 prefix hash (`text_analysis.md5_hash60` — ONE definition of
    the cross-engine contract, reused rather than re-derived) mod buckets.
    Stable across runs, partitionings, and engines — the property that
    makes sampling reproducible and joinable: the same row lands in the
    same bucket on every cluster."""
    from notion_spark.pipeline.text_analysis import md5_hash60

    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(md5_hash60(c.cast("string")), F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls under the stratum's rate — the building block for domain-mixture
    control (sample each source at a target rate). Unlike df.sampleBy this
    is reproducible row-exact (no RNG state, no partition order
    dependence), works incrementally (new data joins the same buckets),
    and is expressible in any engine for audit.

    One codegen'd filter; no shuffle at all.
    """
    chain = F.lit(int(round(default_rate * buckets)))
    for value, rate in sorted(rates.items()):
        chain = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(rate * buckets)))
        ).otherwise(chain)
    return df.filter(hash_bucket(F.col(key_col), buckets) < chain)
