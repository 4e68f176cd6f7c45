from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline import text_analysis as TA


def test_token_counts(spark):
    df = spark.createDataFrame([("hello  world foo",), ("",), ("one-two 3",)], ["text"])
    out = df.select(
        TA.ws_token_count("text").alias("ws"), TA.regex_token_count("text").alias("rx")
    ).collect()
    assert [r.ws for r in out] == [3, 0, 2]
    # 'one-two 3' -> one, -, two, 3
    assert out[2].rx == 4


def test_quality_features_and_score(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "!!! ??? 123 456 !!!")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TA.quality_score(df).collect()}
    assert out[1].stopword_ratio > 0.2 and out[1].punct_ratio == 0.0
    assert out[1].quality > out[2].quality
    assert 0.0 <= out[2].quality <= 1.0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and the dog"),
            (2, "el gato que vive en la casa de los perros"),
            (3, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_pred for r in TA.detect_language(df).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "und"


def test_fingerprint_canonicalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "goodbye world")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.fingerprint for r in TA.with_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_real_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = TA.quality_score(docs)
    assert scored.filter(F.col("n_tokens") > 0).count() == docs.count()
