"""Hashed-feature linear classifier (pipeline/classify): feature-map
correctness, weight normalization, separable-corpus recovery, tie and
empty-document policy, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline.classify import (
    classifier_scores,
    classify,
    hashed_token_features,
    train_class_weights,
)


def _docs(spark):
    # Two fully separable vocabularies: "aa"-family vs "zz"-family.
    rows = [
        (1, "aa bb aa cc", "A"),
        (2, "bb cc aa aa aa", "A"),
        (3, "zz yy zz xx", "Z"),
        (4, "yy xx zz zz", "Z"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lab string")


def test_hashed_features_counts(spark):
    df = spark.createDataFrame([(1, "a b a a b")], "doc_id long, text string")
    feats = hashed_token_features(df, n_buckets=1 << 20)
    counts = sorted(r.cnt for r in feats.collect())
    assert counts == [2, 3]  # b twice, a three times (buckets won't collide)


def test_weights_sum_to_one_micro(spark):
    w = train_class_weights(_docs(spark), "lab", n_buckets=256)
    # per-class relative frequencies sum to 1.0 within half-up rounding
    for r in w.groupBy("label").agg(F.sum("weight").alias("s")).collect():
        assert abs(r.s - 1_000_000) <= 3, r


def test_classify_recovers_separable_labels(spark):
    d = _docs(spark)
    w = train_class_weights(d, "lab", n_buckets=256)
    got = {r.doc_id: r.label for r in classify(d, w, n_buckets=256).collect()}
    assert got == {1: "A", 2: "A", 3: "Z", 4: "Z"}


def test_classify_tie_takes_smallest_label(spark):
    # one shared token, both classes see it once -> equal weights/scores
    d = spark.createDataFrame(
        [(1, "tok", "B"), (2, "tok", "A")], "doc_id long, text string, lab string"
    )
    w = train_class_weights(d, "lab", n_buckets=64)
    got = classify(d, w, n_buckets=64).collect()
    assert {r.label for r in got} == {"A"}


def test_empty_document_gets_no_row(spark):
    d = spark.createDataFrame(
        [(1, "aa bb", "A"), (2, "   ", "A")], "doc_id long, text string, lab string"
    )
    w = train_class_weights(d, "lab", n_buckets=64)
    assert [r.doc_id for r in classify(d, w, n_buckets=64).collect()] == [1]


def test_scores_plan_broadcasts_weights(spark):
    d = _docs(spark)
    w = train_class_weights(d, "lab", n_buckets=64)
    feats = hashed_token_features(d, n_buckets=64)
    plan = (
        classifier_scores(feats, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # the weight table never shuffles the corpus


def test_null_labels_excluded_from_model(spark):
    d = spark.createDataFrame(
        [(1, "aa bb", "A"), (2, "aa bb", None), (3, "zz", "Z")],
        "doc_id long, text string, lab string",
    )
    w = train_class_weights(d, "lab", n_buckets=64)
    assert {r.label for r in w.select("label").distinct().collect()} == {"A", "Z"}
    # the unlabeled doc still gets CLASSIFIED (inference needs no label)
    got = {r.doc_id: r.label for r in classify(d, w, n_buckets=64).collect()}
    assert got[2] == "A"
