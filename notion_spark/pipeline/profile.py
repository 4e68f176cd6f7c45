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


def diversity_index(
    df: DataFrame,
    label_col: str,
    by: Sequence[str] | str | None = None,
) -> DataFrame:
    """Gini-Simpson diversity 1 − Σ pᵢ² of ``label_col``, optionally per
    ``by`` group — the class-balance / source-mixture health number a
    training-data card carries ("is this shard one-source sludge?").
    0 = one label only; → 1 as labels even out.

    Exact rational arithmetic end to end: with per-label counts cᵢ and
    total n, gini = (n² − Σcᵢ²) / n² — both integers — surfaced as
    gini_num / gini_den plus the standard frac6_half_up 6-decimal
    division. No floating-point pᵢ ever exists, so the result is
    bit-identical on any engine and any partitioning (Σpᵢ² in doubles
    would be accumulation-order-dependent). NULL labels count as a
    category of their own (a null-flooded shard is NOT diverse).

    Scale shape: two map-side-combined groupBys — (by, label) then (by)
    — |groups×labels| then |groups| rows; nothing data-sized after the
    first combine."""
    groups = [by] if isinstance(by, str) else list(by or [])
    from notion_spark.functions.exactmath import D38

    counts = df.groupBy(
        *groups, F.coalesce(F.col(label_col).cast("string"), F.lit("∅")).alias("__lbl")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy(*groups).agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum((F.col("c").cast(D38) * F.col("c").cast(D38)).cast(D38)).cast(D38).alias("__sumsq"),
    )
    # DECIMAL(38,0) throughout: n² overflows a BIGINT at ~3e9 rows per
    # group, well inside 100 TB reality. The half-up micro-division
    # uses integral `div` (floor(decimal-divide) rounds HALF_UP at
    # scale 6 BEFORE floor — off by one micro-unit on ~1e-6 of
    # inputs); num*2e6 would overflow DECIMAL(38,0) past n ~ 3e15
    # rows per group, so the same loud double-estimate guard as
    # matview/linfit is folded into every affected output column.
    n38 = F.col("n").cast(D38)
    num = (n38 * n38 - F.col("__sumsq")).cast(D38)
    den = (n38 * n38).cast(D38)
    micro = F.call_function("div", num * F.lit(2000000) + den, den * F.lit(2))
    from notion_spark.functions.exactmath import guarded

    n_d = F.col("n").cast("double")
    _guard = guarded(
        n_d * n_d * 2e6 > F.lit(1e37),
        "diversity_index: n² micro-units exceed DECIMAL(38,0)",
    )

    return agg.select(
        *groups,
        "n",
        "n_labels",
        _guard(num, D38).alias("gini_num"),
        _guard(den, D38).alias("gini_den"),
        _guard(micro / F.lit(1000000.0), "double").alias("gini"),
    )


def compare_profiles(
    before: DataFrame,
    after: DataFrame,
    null_frac_alert_ppm: int = 10_000,
) -> DataFrame:
    """Data-card drift check between two `profile_table` outputs (e.g.
    yesterday's corpus vs today's): per column, row-count change, exact
    null-fraction delta in integer ppm, distinct-estimate ratio, and
    min/max boundary changes — the cheap schema/content regression gate
    a 100 TB ingest runs BEFORE accepting a snapshot (the distribution-
    level sibling is sketches.histogram_drift).

    Output: (col_name, n_rows_before, n_rows_after, null_ppm_before,
    null_ppm_after, null_ppm_delta, distinct_ratio, min_changed,
    max_changed, alert). `alert` fires when |null ppm delta| exceeds
    ``null_frac_alert_ppm``, a column disappeared/appeared (full-outer
    join keeps both sides), or a present column has no computable ppm
    (an empty n_rows=0 snapshot side) — never NULL. ppm values are exact integers (null_frac is
    frac6, ×1e6 recovers the integer micro-units exactly); the distinct
    ratio is the one double (estimates are approximate anyway).

    Both inputs are |columns|-sized — everything here is trivially
    bounded."""
    # ppm is RECOMPUTED from the exact integers (n_null, n_rows) with
    # integral `div` — (null_frac * 1e6).cast(long) truncates the double
    # roundtrip below the true micro value (249/1e6*1e6 = 248.999...,
    # casts to 248) and would flip deltas/alerts by one ppm
    def _ppm(n_null, n_rows):
        d38 = "decimal(38,0)"
        return F.call_function(
            "div",
            F.col(n_null).cast(d38) * F.lit(2000000) + F.col(n_rows).cast(d38),
            F.col(n_rows).cast(d38) * F.lit(2),
        )

    b = before.select(
        "col_name",
        F.col("n_rows").alias("n_rows_before"),
        _ppm("n_null", "n_rows").alias("null_ppm_before"),
        F.col("est_distinct").alias("dist_before"),
        F.col("min_value").alias("min_before"),
        F.col("max_value").alias("max_before"),
    )
    a = after.select(
        "col_name",
        F.col("n_rows").alias("n_rows_after"),
        _ppm("n_null", "n_rows").alias("null_ppm_after"),
        F.col("est_distinct").alias("dist_after"),
        F.col("min_value").alias("min_after"),
        F.col("max_value").alias("max_after"),
    )
    j = b.join(a, "col_name", "full_outer")
    delta = F.col("null_ppm_after") - F.col("null_ppm_before")
    missing = F.col("n_rows_before").isNull() | F.col("n_rows_after").isNull()
    # An EMPTY snapshot side (n_rows=0) yields NULL ppm for a column that
    # is still present; |delta| > threshold would then evaluate NULL and
    # the gate would silently not fire. No computable null fraction is
    # itself a drift signal — alert.
    no_ppm = ~missing & (
        F.col("null_ppm_before").isNull() | F.col("null_ppm_after").isNull()
    )
    return j.select(
        "col_name",
        "n_rows_before",
        "n_rows_after",
        "null_ppm_before",
        "null_ppm_after",
        delta.alias("null_ppm_delta"),
        F.when(
            F.col("dist_before") > 0, F.col("dist_after") / F.col("dist_before")
        ).alias("distinct_ratio"),
        (~F.col("min_before").eqNullSafe(F.col("min_after"))).alias("min_changed"),
        (~F.col("max_before").eqNullSafe(F.col("max_after"))).alias("max_changed"),
        (
            missing
            | no_ppm
            | F.coalesce(F.abs(delta) > F.lit(null_frac_alert_ppm), F.lit(False))
        ).alias("alert"),
    )
