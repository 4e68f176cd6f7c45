"""2-D skyline: brute-force equivalence, edge semantics, in-plan guard."""

from __future__ import annotations

import random

import pytest

from notion_spark.operators.skyline import skyline_2d


def _dom(q, p):
    return q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])


def _brute(rows):
    return sorted(
        p[0] for p in rows if not any(_dom(q, p) for q in rows if q[0] != p[0])
    )


def test_skyline_matches_brute_force(spark):
    for seed in (3, 7, 11):
        random.seed(seed)
        rows = [(i, random.randrange(40), random.randrange(40)) for i in range(250)]
        df = spark.createDataFrame(rows, "k int, price long, size long")
        got = sorted(r.k for r in skyline_2d(df, "price", "size").collect())
        assert got == _brute(rows), f"seed {seed}"


def test_skyline_duplicates_and_single_point(spark):
    # a point that dominates everything -> frontier of exactly the
    # duplicated pair (identical coordinates never dominate each other)
    rows = [(1, 5, 99), (2, 5, 99), (3, 6, 99), (4, 5, 98), (5, 50, 1)]
    df = spark.createDataFrame(rows, "k int, price long, size long")
    got = sorted(r.k for r in skyline_2d(df, "price", "size").collect())
    assert got == [1, 2]


def test_skyline_nulls_excluded(spark):
    rows = [(1, 5, 9), (2, None, 99), (3, 4, None)]
    df = spark.createDataFrame(rows, "k int, price long, size long")
    got = [r.k for r in skyline_2d(df, "price", "size").collect()]
    assert got == [1]


def test_skyline_guard_raises_on_huge_frontier(spark):
    # the skyline worst case: price and size both increase, so no row
    # dominates any other (paying more always buys more) — every row
    # is on the frontier and the global pass must refuse past the cap
    rows = [(i, i, i) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, price long, size long")
    with pytest.raises(Exception, match="output-sized"):
        skyline_2d(df, "price", "size", max_skyline=10).collect()
    # and the same data passes when the guard allows it
    got = sorted(r.k for r in skyline_2d(df, "price", "size").collect())
    assert got == list(range(100))
