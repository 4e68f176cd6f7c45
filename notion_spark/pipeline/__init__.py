"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): exact and
near deduplication, embedding similarity search, text analysis, and
multimodal column plumbing — each designed around one-shuffle (or
shuffle-free) plans that survive a 100 TB input.
"""
