from __future__ import annotations

import json

import pytest

from notion_spark.sources.datasource import NotionPagesDataSource
from notion_spark.sources.ingest import parse_pages
from tests.test_ingest import _page


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(NotionPagesDataSource)
    return spark


def _dump(path, pages):
    with open(path, "w") as f:
        for p in pages:
            f.write(json.dumps(p) + "\n")


def test_datasource_reads_snapshots(registered, tmp_path):
    spark = registered
    _dump(tmp_path / "a.jsonl", [_page("pg-1", 1, ["One"]), _page("pg-2", 2, ["Two"])])
    _dump(tmp_path / "b.jsonl", [_page("pg-3", 3, ["Three"])])

    raw = spark.read.format("notion_pages").option("path", str(tmp_path)).load()
    assert raw.columns == ["raw"]
    assert raw.count() == 3
    assert raw.rdd.getNumPartitions() == 2  # one per snapshot file

    tasks = parse_pages(raw)
    assert sorted(r.name for r in tasks.collect()) == ["One", "Three", "Two"]


def test_datasource_limit_pushdown(registered, tmp_path):
    spark = registered
    _dump(tmp_path / "a.jsonl", [_page(f"pg-{i}", i, [f"T{i}"]) for i in range(10)])
    raw = (
        spark.read.format("notion_pages")
        .option("path", str(tmp_path))
        .option("limit", 4)
        .load()
    )
    assert raw.count() == 4


def test_datasource_missing_path_errors(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception):
        spark.read.format("notion_pages").option("path", str(tmp_path / "nope")).load().count()
