"""Canonical typed data model (SURVEY §1).

The reference stores one row-oriented CSV with Python-repr'd lists
(reference backend/fetch_pages.py:422-441 builds the record; lists are
re-parsed with ast.literal_eval at analyze_pages.py:81-89). Here the
canonical store is Parquet with real ArrayType columns and UTC timestamps;
CSV/JSON are export formats only.

Column names are snake_case; `COLUMN_ALIASES` maps the reference's display
headers ("Parent NID", "Active Tags", ...) for CSV-parity ingest/export.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- tasks: the primary fact table (fetch_pages.py:422-441) ---------------
TASKS_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),          # page id (PK)
        T.StructField("nid", T.LongType(), True),             # unique_id.number
        T.StructField("name", T.StringType(), True),          # title concat
        T.StructField("body_content", T.StringType(), True),  # flattened blocks
        T.StructField("status", T.StringType(), True),
        T.StructField("started", T.TimestampType(), True),
        T.StructField("completed", T.TimestampType(), True),
        T.StructField("due", T.TimestampType(), True),
        T.StructField("updated_time", T.TimestampType(), True),  # watermark
        T.StructField("priority", T.StringType(), True),
        T.StructField("files_media", T.ArrayType(T.StringType()), True),
        T.StructField("created", T.TimestampType(), True),
        T.StructField("parent_uid", T.StringType(), True),
        T.StructField("parent_nid", T.LongType(), True),
        T.StructField("children_uids", T.ArrayType(T.StringType()), True),
        T.StructField("children_nids", T.ArrayType(T.LongType()), True),
        T.StructField("active_tags", T.ArrayType(T.StringType()), True),
        T.StructField("comments", T.StringType(), True),
    ]
)

# Reference CSV headers -> canonical names (fetch_pages.py:422-441 keys).
COLUMN_ALIASES = {
    "UID": "uid",
    "NID": "nid",
    "Name": "name",
    "Body Content": "body_content",
    "Status": "status",
    "Started": "started",
    "Completed": "completed",
    "Due": "due",
    "Updated Time": "updated_time",
    "Priority": "priority",
    "Files & Media": "files_media",
    "Created": "created",
    "Parent UID": "parent_uid",
    "Parent NID": "parent_nid",
    "Children UIDs": "children_uids",
    "Children NIDs": "children_nids",
    "Active Tags": "active_tags",
    "Comments": "comments",
}
CANONICAL_TO_DISPLAY = {v: k for k, v in COLUMN_ALIASES.items()}

# --- blocks: the page-body tree (fetch_pages.py:117-170, 194-308) ---------
# The recursive block tree is modeled as a self-referencing table; body
# flattening is an iterative self-join to fixpoint (see sources/blocks.py).
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("page_uid", T.StringType(), False),
        T.StructField("block_id", T.StringType(), False),
        T.StructField("parent_block_id", T.StringType(), True),
        T.StructField("ord", T.IntegerType(), False),   # sibling order
        T.StructField("type", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),  # JSON per block type
    ]
)

# --- comments (fetch_pages.py:173-191, 412-418) ---------------------------
COMMENTS_SCHEMA = T.StructType(
    [
        T.StructField("page_uid", T.StringType(), False),
        T.StructField("comment_ord", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# --- attachments (fetch_pages.py:350-372, 444-459; reports 256-305) -------
ATTACHMENTS_SCHEMA = T.StructType(
    [
        T.StructField("nid", T.LongType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("ext", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# --- multimodal assets (pipeline extension, not in the reference) ---------
# Opaque binary payload + typed metadata; see pipeline/multimodal.py.
ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
