"""Structured Streaming extensions (SURVEY §2.12).

The reference's incremental fetch is batch watermark-upsert; the streaming
module offers the continuous analogue: a stream of task/event updates
merged into the canonical store keep-last per key via foreachBatch.
"""
