"""Notion page-JSON → canonical tasks table (S1 record assembly).

The reference builds each record row-at-a-time in Python with per-row
point lookups for parent/children NIDs (fetch_pages.py:327-441, lookups
38-64). Here the raw page JSON lands in a DataFrame column and the whole
assembly is column expressions over get_json_object/from_json — bulk
parsed, codegen'd — and FK resolution is ONE broadcast self-join
(SURVEY §2.5 J2) instead of N API calls.

Property names are remappable like the reference's .env knobs
(globals.py:72-81) via the ``props`` argument.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_spark.functions.text import sanitize_filename
from notion_spark.normalize import dispatch_formula_tags

DEFAULT_PROPS = {
    # logical key -> Notion property name (globals.py:72-81 defaults)
    "name": "Name",
    "nid": "ID",
    "status": "Status",
    "started": "Started",
    "completed": "Completed",
    "due": "Due",
    "priority": "Priority",
    "files_media": "Files & Media",
    "parent": "Parent item",
    "children": "Sub-item",
    "active_tags": "Active Tags",
}


def pages_raw_df(spark: SparkSession, pages: Iterable[dict]) -> DataFrame:
    """Raw page objects as one JSON-string column (the connector's landing
    zone; at scale this is what a paginated fetch writes per partition)."""
    return spark.createDataFrame([(json.dumps(p),) for p in pages], "raw string")


def _prop(raw: Column, name: str, *path: str) -> Column:
    """Null-safe nested property access (P11 — the safe_get equivalent;
    Spark JSON path traversal is already null-propagating)."""
    jp = "$.properties['" + name + "']" + "".join(f".{p}" for p in path)
    return F.get_json_object(raw, jp)


def parse_pages(raw_df: DataFrame, props: dict[str, str] | None = None) -> DataFrame:
    """One page row -> the flat task record (fetch_pages.py:422-441),
    BEFORE body/comments joins and parent-NID resolution."""
    p = {**DEFAULT_PROPS, **(props or {})}
    raw = F.col("raw")

    def str_array(jsonpath_result: Column) -> Column:
        """get_json_object's [*] yields a JSON array for 2+ matches but a
        BARE SCALAR for exactly one — parse the array form, fall back to
        wrapping the scalar."""
        return F.coalesce(
            F.from_json(jsonpath_result, "array<string>"),
            # single match is a quoted JSON scalar ('"Solo"') — wrap it in
            # brackets and parse as a one-element array to unquote
            F.from_json(F.concat(F.lit("["), jsonpath_result, F.lit("]")), "array<string>"),
            F.array().cast("array<string>"),
        )

    title_parts = str_array(
        F.get_json_object(raw, f"$.properties['{p['name']}'].title[*].plain_text")
    )
    title = F.concat_ws("", title_parts)

    files = F.from_json(
        _prop(raw, p["files_media"], "files"),
        "array<struct<name:string,type:string>>",
    )
    file_names = F.transform(files, lambda f: sanitize_filename(f["name"]))

    children = str_array(
        F.get_json_object(raw, f"$.properties['{p['children']}'].relation[*].id")
    )

    out = raw_df.select(
        F.get_json_object(raw, "$.id").alias("uid"),
        _prop(raw, p["nid"], "unique_id", "number").cast("long").alias("nid"),
        # Untitled default (fetch_pages.py:425)
        F.when(title == "", F.lit("Untitled")).otherwise(title).alias("name"),
        _prop(raw, p["status"], "select", "name").alias("status"),
        _prop(raw, p["started"], "date", "start").cast("timestamp").alias("started"),
        _prop(raw, p["completed"], "date", "start").cast("timestamp").alias("completed"),
        _prop(raw, p["due"], "date", "start").cast("timestamp").alias("due"),
        F.get_json_object(raw, "$.last_edited_time").cast("timestamp").alias("updated_time"),
        _prop(raw, p["priority"], "select", "name").alias("priority"),
        F.coalesce(file_names, F.array().cast("array<string>")).alias("files_media"),
        F.get_json_object(raw, "$.created_time").cast("timestamp").alias("created"),
        _prop(raw, p["parent"], "relation[0]", "id").alias("parent_uid"),
        children.alias("children_uids"),
        _prop(raw, p["active_tags"], "formula").alias("active_tags_raw"),
    )
    return dispatch_formula_tags(out, "active_tags_raw", "active_tags").drop("active_tags_raw")


def resolve_relation_nids(tasks: DataFrame) -> DataFrame:
    """Bulk parent/children NID resolution (replaces fetch_page_nid's
    per-row RPC + memo dict, fetch_pages.py:38-64): one broadcast
    self-join for parents; children via posexplode + join + re-group.

    Faithful to the reference (fetch_pages.py:378-382): children keep
    their RELATION ORDER, and a child UID absent from the dataset yields a
    NULL entry (not silently dropped) — `len > 0` still classifies such a
    row as a Project (analyze_pages.py:184-190)."""
    lut = F.broadcast(tasks.select(F.col("uid").alias("__u"), F.col("nid").alias("__n")))
    with_parent = (
        tasks.join(lut, tasks["parent_uid"] == lut["__u"], "left")
        .withColumn("parent_nid", F.coalesce(F.col("__n"), F.lit(0)))
        .drop("__u", "__n")
    )
    exploded = with_parent.select(
        "uid", F.posexplode_outer("children_uids").alias("__pos", "__cu")
    ).join(lut, F.col("__cu") == lut["__u"], "left")
    # collect (pos, nid) structs — struct is non-null even when nid is
    # null, so unresolved children survive; sort by pos restores relation
    # order; rows from explode_outer's empty-array placeholder (__pos
    # null) are filtered out.
    child_nids = (
        exploded.filter(F.col("__pos").isNotNull())
        .groupBy("uid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__pos").alias("p"), F.col("__n").alias("n")))),
                lambda s: s["n"],
            ).alias("children_nids")
        )
    )
    return with_parent.join(child_nids, "uid", "left").withColumn(
        "children_nids", F.coalesce("children_nids", F.array().cast("array<long>"))
    )


def assemble_tasks(
    spark: SparkSession,
    pages: Iterable[dict],
    blocks: DataFrame | None = None,
    comments: DataFrame | None = None,
    props: dict[str, str] | None = None,
) -> DataFrame:
    """Full ingest: pages JSON + optional blocks/comments side tables →
    TASKS_SCHEMA frame (process_page parity, set-at-a-time)."""
    tasks = resolve_relation_nids(parse_pages(pages_raw_df(spark, pages), props))
    if blocks is not None:
        from notion_spark.sources.blocks import flatten_body

        body = flatten_body(blocks).withColumnRenamed("page_uid", "uid")
        tasks = tasks.join(body, "uid", "left")
    else:
        tasks = tasks.withColumn("body_content", F.lit(None).cast("string"))
    tasks = tasks.withColumn("body_content", F.coalesce("body_content", F.lit("")))
    if comments is not None:
        # collect_list order is NOT preserved across the aggregation
        # shuffle — collect (ord, text) structs and sort post-agg, like
        # flatten_body does.
        agg = (
            comments.groupBy("page_uid")
            .agg(
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("comment_ord").alias("o"), F.col("text").alias("t")))
                        ),
                        lambda s: s["t"],
                    ),
                ).alias("comments")
            )
            .withColumnRenamed("page_uid", "uid")
        )
        tasks = tasks.join(agg, "uid", "left")
    else:
        tasks = tasks.withColumn("comments", F.lit(None).cast("string"))
    tasks = tasks.withColumn("comments", F.coalesce("comments", F.lit("")))
    cols = [
        "uid", "nid", "name", "body_content", "status", "started", "completed",
        "due", "updated_time", "priority", "files_media", "created",
        "parent_uid", "parent_nid", "children_uids", "children_nids",
        "active_tags", "comments",
    ]
    return tasks.select(*cols)
