"""Table profiling — the data-card pass a 100 TB corpus runs before
anything else: per-column null rates, min/max, and distinct-count
estimates, in exactly TWO bounded passes regardless of column count.

Pass 1 is ONE global aggregate (no shuffle: partial aggregation
collapses each partition to a single row) computing n_rows and every
column's null count and typed min/max — typed FIRST, stringified after,
so numeric min/max never degrade to lexicographic order. Pass 2 stacks
all profiled columns into (col_name, value) rows and reuses the
per-group HyperLogLog (`sketches.hll_distinct(by=...)`): the only
DATA-sized shuffle is that map-side-combined register groupBy, bounded
by columns x 2^p keys — never a count_distinct per column, which would
be a full-cardinality shuffle each. (One more tiny exchange re-groups
the <= cols x 2^p register rows into per-column estimates; the final
join broadcasts the estimate side.)

Null fraction uses the integer micro-unit half-up division (the repo's
engine-exact rounding form), and the whole profile is rebuilt
value-for-value by the DuckDB parity oracle (profile_documents).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from notion_spark.pipeline.sketches import hll_distinct


def profile_table(
    df: DataFrame, columns: Sequence[str] | None = None, p: int = 8
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, null_frac,
    est_distinct, min_value, max_value), one row per profiled column.

    ``columns`` defaults to every column; pass an explicit list on wide
    tables to keep the stacked HLL pass proportional to what you need.
    """
    cols = list(columns) if columns is not None else [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    base = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__min`, `{c}__max`" for c in cols
    )
    meta = base.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, min_value, max_value)"
        ),
    )
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.value")
    est = hll_distinct(stacked, "value", p=p, by=["col_name"]).select(
        "col_name", "est_distinct"
    )
    from notion_spark.pipeline.text_analysis import frac6_half_up

    return (
        meta.join(F.broadcast(est), "col_name", "left")  # est is <= #cols rows
        .select(
            "col_name",
            "n_rows",
            "n_null",
            frac6_half_up(F.col("n_null"), F.col("n_rows")).alias("null_frac"),
            # a column that is entirely null never reaches the HLL
            # (nulls are filtered before hashing) -> 0 distinct
            F.coalesce("est_distinct", F.lit(0.0)).alias("est_distinct"),
            "min_value",
            "max_value",
        )
    )
