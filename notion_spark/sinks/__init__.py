"""Render sinks (SURVEY §2.1 S8-S10): text report, charts, PDF.

All sinks collect ALREADY-AGGREGATED / already-limited frames — every
collect here is human-scale by construction (the queries own the top-k
limits), never a full-table materialization.
"""
