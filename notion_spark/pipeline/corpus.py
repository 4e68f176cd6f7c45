"""End-to-end corpus curation preset — the standard LLM-training-data
flow composed from this package's operators, in the canonical order:

1. quality filter   (`curation.quality_rules` — codegen'd projection)
2. exact dedup      (`dedup.drop_exact_dups` — one hash groupBy; MUST
                     precede near-dedup: it collapses the identical-doc
                     mass that forms degenerate LSH buckets)
3. near dedup       (`dedup.minhash_dedup_pairs` + `dedup_clusters` —
                     banded LSH, exact-Jaccard verify, connected
                     components, keep the minimum-id representative)
4. decontamination  (`curation.decontaminate` — n-gram overlap vs a
                     broadcast benchmark set)
5. split assignment (`curation.assign_splits` — hash-range buckets,
                     keyed AFTER dedup so every surviving id is its own
                     cluster representative and near-dup leakage across
                     splits is structurally impossible)

Each stage is the already-oracle-verified operator; this module only
fixes the composition order and threads the audit trail through. One
intermediate IS persisted: the exact-dedup output feeds THREE
independent subtrees (LSH signature pass, shingle verify-set pass,
cluster join-back — plus the report counts), and without a cache each
one re-runs the input scan + quality semi-join + exact-dedup shuffle
from scratch; at corpus scale that is 3-4 full input scans for one
(the r2 edge-cache lesson, applied to the preset). Everything else
stays lazy — Catalyst sees one plan per remaining stage (plus the
near-dedup edge cache documented in `connected_components`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from notion_spark.pipeline import curation as CU
from notion_spark.pipeline import dedup as DD


@dataclass
class CurationReport:
    """Row counts per stage — the audit trail a data card needs."""

    input_rows: int = 0
    after_quality: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_decontam: int = 0
    splits: dict[str, int] = field(default_factory=dict)


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.8,
    decontam_ngram: int = 13,
    split_fractions: dict[str, float] | None = None,
    max_bucket: int = 1000,
    quality_kwargs: dict | None = None,
    collect_report: bool = False,
    persist_intermediate: bool = True,
) -> tuple[DataFrame, CurationReport | None]:
    """Run the full curation flow; returns (curated frame with a
    ``split`` column, report or None).

    ``collect_report=True`` triggers one count() per stage (5 extra
    actions) — leave it off in pipelines that only need the result.
    ``quality_kwargs`` forwards to `curation.quality_rules` (e.g.
    min_words for short-document corpora).
    ``persist_intermediate`` caches the exact-dedup output, the one
    multi-consumer frame in the flow (see module docstring); the cache
    populates lazily on the caller's first action. Pass False in
    single-pass pipelines that go straight to one write, or unpersist
    via spark.catalog.clearCache() between corpora in a long-running
    driver.
    """
    report = CurationReport() if collect_report else None
    if report is not None:
        report.input_rows = df.count()

    quality = CU.quality_rules(
        df, text_col=text_col, id_col=id_col, **(quality_kwargs or {})
    )
    kept = df.join(
        quality.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    if report is not None:
        report.after_quality = kept.count()

    kept = DD.drop_exact_dups(kept, text_col, id_col)
    if persist_intermediate:
        kept = kept.persist()
    if report is not None:
        report.after_exact_dedup = kept.count()

    pairs = DD.minhash_dedup_pairs(
        kept, text_col, id_col, threshold=near_dup_threshold, max_bucket=max_bucket
    )
    kept = DD.dedup_clusters(kept, pairs, id_col)
    if report is not None:
        report.after_near_dedup = kept.count()

    if benchmark is not None:
        kept = CU.decontaminate(
            kept, benchmark, n=decontam_ngram, text_col=text_col, id_col=id_col
        )
    if report is not None:
        report.after_decontam = kept.count()

    out = CU.assign_splits(kept, id_col, split_fractions)
    if report is not None:
        report.splits = {
            r.split: r.n
            for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    return out, report
