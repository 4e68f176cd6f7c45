"""Substring-span dedup (Lee et al. ExactSubstr, token-level), gram
novelty, and hard-negative mining."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from notion_spark.pipeline.dedup import (
    duplicate_spans,
    gram_novelty,
    positional_gram_hashes,
)
from notion_spark.pipeline.similarity import hard_negatives


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positional_gram_hashes_positions_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b"), (3, None)])
    out = positional_gram_hashes(df, k=3).collect()
    # doc 1: 5 tokens -> positions 1..3; doc 2 too short; doc 3 null
    assert sorted((r.id, r.pos) for r in out) == [(1, 1), (1, 2), (1, 3)]
    # identical grams hash identically
    df2 = _docs(spark, [(1, "x y z"), (2, "x y z")])
    h = [r.h for r in positional_gram_hashes(df2, k=3).collect()]
    assert h[0] == h[1]


def test_duplicate_spans_merges_overlapping_grams(spark):
    # the 6-token phrase is shared -> its 4 consecutive 3-grams merge
    # into ONE maximal span per doc
    shared = "q w e r t y"
    df = _docs(spark, [(1, f"{shared} aa bb cc"), (2, f"dd ee {shared}")])
    out = {r.doc_id: r for r in duplicate_spans(df, k=3).collect()}
    assert out[1].span_start == 1 and out[1].span_end == 6 and out[1].n_grams == 4
    assert out[2].span_start == 3 and out[2].span_end == 8 and out[2].n_grams == 4


def test_duplicate_spans_splits_on_gap(spark):
    # two shared phrases separated by > k unique tokens -> two spans
    df = _docs(
        spark,
        [
            (1, "p1 p2 p3 u1 u2 u3 u4 u5 z1 z2 z3"),
            (2, "p1 p2 p3 v1 v2 v3 v4 v5 z1 z2 z3"),
        ],
    )
    out = duplicate_spans(df, k=3).collect()
    spans = sorted((r.doc_id, r.span_start, r.span_end) for r in out)
    assert spans == [(1, 1, 3), (1, 9, 11), (2, 1, 3), (2, 9, 11)]


def test_duplicate_spans_counts_within_doc_repeats(spark):
    # ExactSubstr counts total occurrences: a gram repeated twice INSIDE
    # one doc is duplicated even if no other doc has it
    df = _docs(spark, [(1, "r1 r2 r3 x y z r1 r2 r3")])
    out = sorted(
        (r.span_start, r.span_end) for r in duplicate_spans(df, k=3).collect()
    )
    assert out == [(1, 3), (7, 9)]


def test_duplicate_spans_no_dups_empty(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    assert duplicate_spans(df, k=3).count() == 0


def test_gram_novelty_exact_fraction(spark):
    # doc 1: 4 grams, 2 duplicated (shared prefix with doc 2) -> 0.5
    df = _docs(spark, [(1, "s1 s2 s3 s4 a b"), (2, "s1 s2 s3 s4 c d")])
    out = {r.doc_id: r for r in gram_novelty(df, k=3).collect()}
    assert out[1].n_grams == 4
    assert out[1].n_dup_grams == 2
    assert out[1].dup_frac == 0.5
    # all-unique doc scores 0
    df2 = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    out2 = {r.doc_id: r for r in gram_novelty(df2, k=3).collect()}
    assert out2[1].dup_frac == 0.0 and out2[2].n_dup_grams == 0


def test_gram_novelty_half_up_rounding(spark):
    # 1 duplicated of 6 grams -> 1/6 -> 0.166667 (half-up, not truncated)
    df = _docs(
        spark,
        [(1, "d1 d2 d3 a b c d e"), (2, "d1 d2 d3 z z2 z3 z4 z5")],
    )
    out = {r.doc_id: r for r in gram_novelty(df, k=3).collect()}
    assert out[1].n_grams == 6
    assert out[1].dup_frac == 0.166667


def test_hard_negatives_excludes_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 0),  # anchor, label 0
        (1, [0.99, 0.1], 0),  # nearest but SAME label -> excluded
        (2, [0.9, 0.2], 1),
        (3, [0.0, 1.0], 1),
        (4, [0.8, 0.3], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    anchors = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = hard_negatives(df, anchors, k=2).collect()
    got = [(r.vec_id, r.rank) for r in out]
    # vec 1 (same label) and the anchor itself never appear
    assert got == [(2, 1), (4, 2)]


def test_hard_negatives_rank_ties_break_by_id(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (5, [0.5, 0.5], 1),
        (3, [0.5, 0.5], 1),  # identical vector, lower id wins the tie
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    anchors = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = hard_negatives(df, anchors, k=2).collect()
    assert [(r.vec_id, r.rank) for r in out] == [(3, 1), (5, 2)]


def test_duplicate_spans_plan_has_no_cartesian(spark):
    """Plan shape: the substring path must stay linear — no
    CartesianProduct/BroadcastNestedLoop anywhere."""
    df = _docs(spark, [(1, "a b c d e f g h"), (2, "a b c d e f g h")])
    plan = duplicate_spans(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_duplicate_spans_plan_single_gram_pass(spark):
    """Perf pin (r5, measured 2.4x): the gram explode must appear exactly
    ONCE in the plan — the groupBy+join formulation duplicated the
    Generate (one per side) and regressed sf1 wall time 5.5s -> 13s."""
    df = _docs(spark, [(1, "a b c d e f g h"), (2, "a b c d e f g h")])
    for op in (duplicate_spans, gram_novelty):
        plan = op(df, k=3)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate explode") + plan.count("Generate posexplode") == 1, op.__name__


def test_group_overlap_matrix_exact_jaccard(spark):
    from notion_spark.pipeline.dedup import group_overlap_matrix

    df = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),   # grams: {a b c, b c d}
            (2, "a b c x", "s2"),   # grams: {a b c, b c x}
            (3, "p q r s", "s3"),   # no overlap with anyone
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.group_a, r.group_b): r for r in group_overlap_matrix(df, "source").collect()}
    # s1 ∩ s2 = {a b c} -> 1 / (2+2-1) = 1/3 -> 0.333333
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    assert (r.inter, r.n_a, r.n_b) == (1, 2, 2)
    assert r.jaccard == 0.333333


def test_knn_label_disagreement_counts_and_edge(spark):
    from notion_spark.pipeline.similarity import knn_label_disagreement

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.2], 1),
        (3, [0.7, 0.3], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    anchors = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    # k=2: neighbors are 1 (same) and 2 (diff) -> 1/2
    r = knn_label_disagreement(df, anchors, k=2).collect()[0]
    assert (r.n_neighbors, r.n_disagree, r.disagreement) == (2, 1, 0.5)
    # k larger than corpus-1: n_neighbors reports the true 3, not k
    r = knn_label_disagreement(df, anchors, k=10).collect()[0]
    assert r.n_neighbors == 3 and r.n_disagree == 2
    assert r.disagreement == 0.666667
