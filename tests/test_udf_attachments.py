from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from notion_spark.config import EngineConfig
from notion_spark.functions.udf import grouped_transform, utf8_byte_length, vectorized
from notion_spark.sources.attachments import attachment_previews, read_attachment_files


def test_vectorized_pandas_udf(spark):
    df = spark.createDataFrame([("héllo",), ("ascii",), (None,)], "s string")
    rows = [r.n for r in df.select(utf8_byte_length("s").alias("n")).collect()]
    assert rows == [6, 5, 0]  # é is 2 bytes


def test_vectorized_decorator_custom(spark):
    @vectorized("double")
    def half(s: pd.Series) -> pd.Series:
        return s / 2.0

    df = spark.createDataFrame([(4.0,), (5.0,)], "x double")
    assert [r.h for r in df.select(half("x").alias("h")).collect()] == [2.0, 2.5]


def test_grouped_transform(spark):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 10.0)], "k string, v double")
    out = {(r.k, r.v) for r in grouped_transform(df, ["k"], demean, "k string, v double").collect()}
    assert out == {("a", -1.0), ("a", 1.0), ("b", 0.0)}


def test_attachments_pipeline(spark, tmp_path):
    d = tmp_path / "attachments" / "7"
    d.mkdir(parents=True)
    (d / "notes.txt").write_text("hello " * 300)  # > 1000 chars
    (d / "data.csv").write_text("a,b\n1,2")
    (tmp_path / "attachments" / "8").mkdir()
    (tmp_path / "attachments" / "8" / "small.md").write_text("# tiny")

    att = read_attachment_files(spark, str(tmp_path / "attachments"))
    rows = {(r.nid, r.filename): r for r in att.collect()}
    assert set(rows) == {(7, "notes.txt"), (7, "data.csv"), (8, "small.md")}

    prev = {
        (r.nid, r.filename): r
        for r in attachment_previews(att, EngineConfig()).collect()
    }
    big = prev[(7, "notes.txt")]
    assert big.is_readable and big.preview.endswith("... (truncated)")
    assert len(big.preview) <= 1000 + len("\n... (truncated)")
    assert not prev[(7, "data.csv")].is_readable and prev[(7, "data.csv")].preview is None
    assert prev[(8, "small.md")].preview == "# tiny"
