"""End-to-end corpus curation preset: composition equals the manual
stage-by-stage application, and the audit report is consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline import curation as CU
from notion_spark.pipeline import dedup as DD
from notion_spark.pipeline.corpus import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog wakes up "
    "and chases the fox around the field for a while before they both rest "
    "under a tree near the river where the water is cold and clear today"
)
OTHER = (
    "a completely different report about machines and factories where the "
    "workers assemble engines all day and the manager counts the parts in "
    "the warehouse before the trucks arrive to collect them every evening"
)
BENCH_SENT = (
    "benchmark sentinel section with thirteen distinct tokens appended "
    "here for overlap checking purposes"
)


def _corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),                             # exact dup of 1
        (3, GOOD.replace("river", "stream")),  # near dup of 1
        (4, OTHER),                            # genuinely distinct doc
        (5, "too short"),                      # fails quality rules
        # distinct doc carrying a benchmark passage -> decontaminated
        (6, OTHER.replace("report", "story").replace("engines", "robots")
            .replace("evening", "morning") + " " + BENCH_SENT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_matches_manual_stages(spark):
    df = _corpus(spark)
    bench = spark.createDataFrame([(100, BENCH_SENT)], "doc_id long, text string")
    out, report = curate_corpus(
        df, benchmark=bench, near_dup_threshold=0.5,
        quality_kwargs={"min_words": 10}, collect_report=True,
    )
    got = {r.doc_id: r.split for r in out.collect()}

    # manual composition
    q = CU.quality_rules(df, min_words=10)
    kept = df.join(q.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    kept = DD.drop_exact_dups(kept)
    pairs = DD.minhash_dedup_pairs(kept, threshold=0.5)
    kept = DD.dedup_clusters(kept, pairs)
    kept = CU.decontaminate(kept, bench)
    manual = {r.doc_id: r.split for r in CU.assign_splits(kept, "doc_id").collect()}
    assert got == manual

    # semantic spot checks: 5 fails quality; 2 exact-dups to 1; 3
    # near-dups to 1; 6 survives near-dedup (three word swaps plus the
    # appended passage hold its jaccard vs 4 under 0.5) and is then
    # removed by decontamination; 1 and 4 survive
    assert set(got) == {1, 4}
    assert report.input_rows == 6
    assert report.after_quality == 5
    assert report.after_exact_dedup == 4
    assert report.after_near_dedup == 3
    assert report.after_decontam == 2
    assert sum(report.splits.values()) == 2


def test_curate_corpus_persists_multi_consumer_frame(spark):
    """The exact-dedup output feeds three subtrees (LSH signatures,
    shingle verify-sets, cluster join-back); the preset must pin it in
    the cache so the input scan + quality join + exact-dedup shuffle run
    once, not once per consumer (the r2 edge-cache lesson)."""
    df = _corpus(spark)
    # opt-out stays lazy end to end (checked FIRST: Spark's cache
    # manager substitutes cached fragments into any matching later plan)
    out_lazy, _ = curate_corpus(
        df, near_dup_threshold=0.5, quality_kwargs={"min_words": 10},
        persist_intermediate=False,
    )
    lazy_plan = out_lazy._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in lazy_plan
    out, _ = curate_corpus(df, near_dup_threshold=0.5, quality_kwargs={"min_words": 10})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan
    spark.catalog.clearCache()  # drop the preset's pinned frame for later tests


def test_curate_corpus_no_benchmark_no_report(spark):
    out, report = curate_corpus(_corpus(spark), near_dup_threshold=0.5, quality_kwargs={"min_words": 10})
    assert report is None
    ids = {r.doc_id for r in out.collect()}
    assert 5 not in ids and 2 not in ids  # quality + exact dedup applied
    assert "split" in out.columns
