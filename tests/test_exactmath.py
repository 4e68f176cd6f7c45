"""Shared exact-math helpers (functions/exactmath)."""

from __future__ import annotations

from fractions import Fraction

import duckdb
from pyspark.sql import functions as F

from notion_spark.functions.exactmath import (
    halfup_micro_div_cols,
    halfup_micro_div_sql,
    micro_units,
)

BIG_CASES = [
    (4_500_000_000_000_00, 1_500_000 * 100),        # sf1-scale cents / den
    (25782603026384349304, 301179807776749875816),  # > int64 numerator pair
    (7, 3),
    (1, 2),                                          # exact tie -> half up
]


def test_halfup_micro_div_matches_fraction_and_duckdb(spark):
    rows = [(str(n), str(d)) for n, d in BIG_CASES]
    df = spark.createDataFrame(rows, "n string, d string").select(
        F.col("n").cast("decimal(38,0)").alias("n"),
        F.col("d").cast("decimal(38,0)").alias("d"),
    )
    got = [r["q"] for r in df.select(halfup_micro_div_cols("n", "d").alias("q")).collect()]
    for (n, d), q in zip(BIG_CASES, got):
        # positive operands: exact round-half-up of n/d in micro-units
        frac = Fraction(n, d) * 1_000_000
        want = (frac.numerator * 2 + frac.denominator) // (2 * frac.denominator)
        assert q == want, (n, d, q, want)
    con = duckdb.connect()
    for n, d in BIG_CASES:
        sql = halfup_micro_div_sql(str(n), str(d))
        duck = con.execute(f"SELECT {sql}").fetchone()[0]
        frac = Fraction(n, d) * 1_000_000
        want = (frac.numerator * 2 + frac.denominator) // (2 * frac.denominator)
        assert duck == want


def test_micro_units_floor_and_null(spark):
    df = spark.createDataFrame([(1.2345678,), (-1.2345678,), (None,)], "v double")
    got = [r[0] for r in df.select(micro_units("v")).collect()]
    assert [int(x) if x is not None else None for x in got] == [1234567, -1234568, None]
