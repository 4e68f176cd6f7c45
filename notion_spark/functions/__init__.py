"""Scalar column-function library (SURVEY §2.10 X1-X12)."""

from notion_spark.functions.text import (
    clean_text,
    sanitize_filename,
    truncate_lines,
    truncate_text,
)
from notion_spark.functions.dates import iso_week_label, week_start

__all__ = [
    "clean_text",
    "sanitize_filename",
    "truncate_lines",
    "truncate_text",
    "iso_week_label",
    "week_start",
]
