from __future__ import annotations

import datetime as dt

from notion_spark.sources.ingest import assemble_tasks


def _page(pid, nid, title, parent=None, children=(), status="Doing", tags=None):
    props = {
        "Name": {"title": [{"plain_text": t} for t in title]},
        "ID": {"unique_id": {"number": nid}},
        "Status": {"select": {"name": status}},
        "Started": {"date": {"start": "2026-01-01T10:00:00+03:00"}},
        "Completed": {"date": None},
        "Due": {"date": {"start": "2026-02-01T00:00:00"}},
        "Priority": {"select": {"name": "High (1wk)"}},
        "Files & Media": {
            "files": [{"name": 'bad<file>:name.txt', "type": "file"}]
        },
        "Parent item": {"relation": ([{"id": parent}] if parent else [])},
        "Sub-item": {"relation": [{"id": c} for c in children]},
        "Active Tags": {
            "type": "formula",
            "formula": tags or {"type": "string", "string": "work, dev"},
        },
    }
    return {
        "id": pid,
        "created_time": "2025-12-01T00:00:00.000Z",
        "last_edited_time": "2026-01-10T05:00:00.000Z",
        "properties": props,
    }


def test_assemble_tasks_end_to_end(spark):
    pages = [
        _page("pg-1", 1, ["Project ", "Alpha"], children=("pg-2", "pg-3")),
        _page("pg-2", 2, ["Child one"], parent="pg-1"),
        _page("pg-3", 3, ["Child two"], parent="pg-1",
              tags={"type": "multi_select", "multi_select": [{"name": "ops"}]}),
        _page("pg-4", 4, []),  # empty title -> Untitled
    ]
    tasks = {r.uid: r for r in assemble_tasks(spark, pages).collect()}
    assert len(tasks) == 4

    root = tasks["pg-1"]
    assert root.name == "Project Alpha"  # title concat
    assert root.nid == 1 and root.parent_nid == 0
    assert root.children_uids == ["pg-2", "pg-3"] and root.children_nids == [2, 3]
    assert root.active_tags == ["work", "dev"]
    assert root.files_media == ["bad_file__name.txt"]  # sanitized
    # offset-bearing Started normalized to the UTC instant
    assert root.started == dt.datetime(2026, 1, 1, 7, 0, 0)
    assert root.updated_time == dt.datetime(2026, 1, 10, 5, 0, 0)

    child = tasks["pg-2"]
    assert child.parent_uid == "pg-1" and child.parent_nid == 1
    assert child.children_nids == []

    assert tasks["pg-3"].active_tags == ["ops"]
    assert tasks["pg-4"].name == "Untitled"


def test_assemble_with_blocks_and_comments(spark):
    import json

    from notion_spark.schema import BLOCKS_SCHEMA, COMMENTS_SCHEMA

    pages = [_page("pg-1", 1, ["T"])]
    payload = json.dumps(
        {"rich_text": [{"plain_text": "hello", "href": None,
                        "annotations": {"bold": False, "italic": False, "underline": False,
                                        "strikethrough": False, "code": False}}]}
    )
    blocks = spark.createDataFrame([("pg-1", "b1", None, 0, "paragraph", payload)], BLOCKS_SCHEMA)
    comments = spark.createDataFrame(
        [("pg-1", 0, "first"), ("pg-1", 1, "second")], COMMENTS_SCHEMA
    )
    row = assemble_tasks(spark, pages, blocks, comments).collect()[0]
    assert row.body_content == "hello"
    assert row.comments == "first\nsecond"


def test_property_remapping(spark):
    page = _page("pg-1", 1, ["T"])
    page["properties"]["My Status"] = page["properties"].pop("Status")
    row = assemble_tasks(spark, [page], props={"status": "My Status"}).collect()[0]
    assert row.status == "Doing"


def test_single_element_title_and_child(spark):
    # get_json_object returns a bare scalar for single-element [*] matches —
    # regression for titles/relations silently becoming empty
    pages = [
        _page("pg-1", 1, ["Solo"], children=("pg-2",)),
        _page("pg-2", 2, ["Kid"], parent="pg-1"),
    ]
    tasks = {r.uid: r for r in assemble_tasks(spark, pages).collect()}
    assert tasks["pg-1"].name == "Solo"
    assert tasks["pg-1"].children_uids == ["pg-2"]
    assert tasks["pg-1"].children_nids == [2]
