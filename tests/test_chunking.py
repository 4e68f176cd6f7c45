"""Chunking / packing / SCD2 / sketch unit tests.

Small hand-built frames with known answers; the sf-scale parity checks
live in notion_spark/parity.py (chunk_token_windows,
pack_sequence_offsets, scd2_status_intervals, sketch_kmv_users,
sketch_hll_users).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.operators.incremental import scd2_intervals
from notion_spark.pipeline.chunking import chunk_documents, pack_sequences
from notion_spark.pipeline.sketches import hll_distinct, kmv_distinct


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


# ------------------------------------------------------------- chunking
def test_chunk_disjoint_covers_every_token(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(_docs(spark, [(1, text, "a")]), size=4).collect()
    assert [r.start_token for r in out] == [1, 5, 9]
    assert [r.n_tokens for r in out] == [4, 4, 2]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[2].chunk_text == "t8 t9"
    assert [r.chunk_id for r in out] == [0, 1, 2]


def test_chunk_overlapping_stride(spark):
    text = " ".join(f"t{i}" for i in range(7))
    out = chunk_documents(_docs(spark, [(1, text, "a")]), size=4, stride=2).collect()
    # starts 1,3,5,7 — every token in >=1 window, overlap of 2
    assert [r.start_token for r in out] == [1, 3, 5, 7]
    assert [r.n_tokens for r in out] == [4, 4, 3, 1]


def test_chunk_empty_and_null_docs_produce_no_rows(spark):
    df = _docs(spark, [(1, "", "a"), (2, "   ", "a"), (3, None, "a"), (4, "one two", "a")])
    out = chunk_documents(df, size=8)
    assert [r.id for r in out.collect()] == [4]


def test_chunk_is_narrow_no_shuffle(spark):
    plan = chunk_documents(
        _docs(spark, [(1, "a b c", "s")]), size=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------- packing
def test_pack_sequences_offsets_and_boundaries(spark):
    rows = [
        (1, " ".join(["x"] * 100), "s1"),   # offset 0, packs 0..0
        (2, " ".join(["x"] * 200), "s1"),   # offset 100, last tok 299 -> packs 0..1
        (3, "", "s1"),                       # zero tokens at offset 300
        (4, " ".join(["x"] * 300), "s1"),   # offset 300, last 599 -> packs 1..2
        (5, " ".join(["x"] * 10), "s2"),    # independent shard
    ]
    out = {r.id: r for r in pack_sequences(_docs(spark, rows), budget=256).collect()}
    assert (out[1].start_offset, out[1].pack_first, out[1].pack_last) == (0, 0, 0)
    assert (out[2].start_offset, out[2].pack_first, out[2].pack_last) == (100, 0, 1)
    assert out[2].spans_boundary
    assert (out[3].n_tokens, out[3].start_offset) == (0, 300)
    assert out[3].pack_first == out[3].pack_last and not out[3].spans_boundary
    assert (out[4].pack_first, out[4].pack_last) == (1, 2)
    assert (out[5].shard, out[5].start_offset) == ("s2", 0)


def test_pack_null_text_counts_zero_tokens(spark):
    out = pack_sequences(_docs(spark, [(1, None, "s"), (2, "a b", "s")]), budget=4)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n_tokens == 0 and rows[2].start_offset == 0


# ------------------------------------------------------------- SCD2
def test_scd2_collapses_runs_and_builds_intervals(spark):
    rows = [
        # key, attr, ts, tiebreak
        (1, "A", "2024-01-01", 1),
        (1, "A", "2024-01-02", 2),  # same run — collapsed
        (1, "B", "2024-01-03", 3),
        (1, "A", "2024-01-04", 4),  # back to A: a NEW interval
        (2, "X", "2024-01-01", 5),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts string, tb int")
    out = scd2_intervals(df, "k", "attr", "ts", "tb").orderBy("k", "valid_from").collect()
    k1 = [r for r in out if r.k == 1]
    assert [(r.attr, r.valid_from, r.valid_to) for r in k1] == [
        ("A", "2024-01-01", "2024-01-03"),
        ("B", "2024-01-03", "2024-01-04"),
        ("A", "2024-01-04", None),
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current


def test_scd2_null_attr_is_a_change(spark):
    rows = [
        (1, "A", "2024-01-01", 1),
        (1, None, "2024-01-02", 2),  # A -> null must survive as a change
        (1, None, "2024-01-03", 3),  # null run collapses
        (1, "B", "2024-01-04", 4),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts string, tb int")
    out = scd2_intervals(df, "k", "attr", "ts", "tb").orderBy("valid_from").collect()
    assert [(r.attr, r.valid_from) for r in out] == [
        ("A", "2024-01-01"),
        (None, "2024-01-02"),
        ("B", "2024-01-04"),
    ]


# ------------------------------------------------------------- sketches
def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.is_exact and row.n_minima == 50 and row.est_distinct == 50.0


def test_kmv_estimate_within_tolerance(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert not row.is_exact
    # std error ~ 1/sqrt(k) ≈ 6.25%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_kmv_duplicates_do_not_inflate(spark):
    df = spark.range(10_000).select((F.col("id") % 40).cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.is_exact and row.est_distinct == 40.0


def test_hll_estimate_within_tolerance(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    row = hll_distinct(df, "v", p=8).collect()[0]
    # std error ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.26
    assert row.m == 256


def test_hll_registers_merge_across_shards(spark):
    from notion_spark.pipeline.sketches import hll_registers

    a = spark.range(0, 5_000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2_500, 10_000).select(F.col("id").cast("string").alias("v"))
    both = a.unionByName(b)
    merged = (
        hll_registers(a, "v", p=8)
        .unionByName(hll_registers(b, "v", p=8))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    direct = hll_registers(both, "v", p=8)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_grouped_matches_per_group_global(spark):
    # one sketch per group out of one shuffle == running the global
    # sketch on each group's filtered frame
    rows = [(g, f"u{g}-{i % (50 * (g + 1))}") for g in range(3) for i in range(400)]
    df = spark.createDataFrame(rows, "grp int, v string")
    grouped = {
        r.grp: (r.n_empty_registers, r.harmonic_scaled, r.est_distinct)
        for r in hll_distinct(df, "v", p=8, by=["grp"]).collect()
    }
    assert set(grouped) == {0, 1, 2}
    for g in range(3):
        row = hll_distinct(df.filter(F.col("grp") == g), "v", p=8).collect()[0]
        assert grouped[g] == (row.n_empty_registers, row.harmonic_scaled, row.est_distinct)
