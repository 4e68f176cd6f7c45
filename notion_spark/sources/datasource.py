"""Python DataSource (Spark 4 API) for Notion page snapshots — S1 as a
real pluggable source with limit pushdown (SURVEY §2.1: page_size ≤ 100,
limit pushed into the scan, fetch_pages.py:67-114).

Offline-first: the source reads JSON-lines page snapshots (one page
object per line — what a connector dump or a landing zone holds), one
input partition per file, honoring a pushed `limit` option by capping
per-partition reads. A live-API variant plugs the HTTP client into
`read()` — cursor pagination is inherently sequential, so a live scan is
one partition and the parallelism lives in the per-page block/comment
fetches (SURVEY §3 EP1); snapshots are where partitioned scans shine.

Usage:
    spark.dataSource.register(NotionPagesDataSource)
    raw = (spark.read.format("notion_pages")
                .option("path", "/data/pages-dump/")
                .option("limit", 500)
                .load())
    tasks = parse_pages(raw)
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilesPartition(InputPartition):
    def __init__(self, paths: list[str], cap: int):
        self.paths = paths
        self.cap = cap


class NotionPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("notion_pages requires .option('path', <file-or-dir>)")
        limit = options.get("limit")
        self.limit = int(limit) if limit is not None else None

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(glob.glob(os.path.join(self.path, "*.jsonl")))
        return sorted(glob.glob(self.path))

    def partitions(self):
        files = self._files()
        if not files:
            raise FileNotFoundError(f"no page snapshot files under {self.path}")
        if self.limit is None:
            return [_FilesPartition([f], -1) for f in files]
        # EXACT limit pushdown: a pushed limit implies a small read, so
        # collapse to one sequential partition carrying the global cap
        # (a per-file cap would return up to limit × n_files rows).
        return [_FilesPartition(files, self.limit)]

    def read(self, partition: _FilesPartition):
        n = 0
        for path in partition.paths:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    if partition.cap >= 0 and n >= partition.cap:
                        return
                    n += 1
                    yield (line,)


class NotionPagesDataSource(DataSource):
    """`spark.read.format("notion_pages")` → one `raw` string column of
    page JSON, feeding sources.ingest.parse_pages."""

    @classmethod
    def name(cls) -> str:
        return "notion_pages"

    def schema(self) -> str:
        return "raw string"

    def reader(self, schema) -> NotionPagesReader:
        return NotionPagesReader(self.options)
