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


def numeric_correlations(
    df: DataFrame,
    cols: Sequence[str],
    by: str | None = None,
) -> DataFrame:
    """Pairwise Pearson structure over integer-valued columns — the
    bivariate half of the data card (which features move together,
    which quality signal is redundant). One row per unordered pair:
    (col_x, col_y, n, cov, r_sign, r2).

    Exact-moment arithmetic, engine-exact results: the ONLY aggregation
    is integer sums (n, Σx, Σx², Σxy per pair) — per-row products in
    exact LONG under an in-plan |x| ≤ 1e7 row guard, summed in decimal —
    map-side combined, order-independent, bit-identical on any engine
    and partitioning. The derived values follow the repo's
    identical-IEEE-ops contract: num = n·Σxy − Σx·Σy and
    den = n·Σx² − (Σx)² are exact integers, each CAST once to double
    (correctly rounded on both engines), and the final
    cov = num / (n(n−1)), r2 = num² / (den_x·den_y) are single IEEE
    multiplies/divides of those identical doubles — no
    accumulation-order drift, unlike engine corr()/covar_samp() whose
    running-moment update order differs per engine and partition count.
    r_sign carries the correlation's direction exactly (r itself needs
    a sqrt — transcendental, never hash-matches — so the exact surface
    is sign + r²).

    Columns must be INTEGER-valued with |x| ≤ 1e7 (pre-scale decimals
    to cents — the caller owns the fixed-point contract; the row guard
    raises loudly past the bound instead of letting a LONG product
    wrap). Rows with a null in ANY profiled column are dropped (single
    listwise n, one honest denominator for every pair). Constant
    columns yield null r2; n < 2 yields null cov.

    ``by`` computes the same structure PER GROUP (the per-source /
    per-language data card): the single aggregate becomes one
    map-side-combined groupBy — still no data-sized shuffle (the
    exchange carries one moment row per group per partition) — and
    every output row gains a leading ``group`` column. Rows with a
    NULL group are excluded.

    Scale shape: ONE global aggregate — partial aggregation collapses
    each partition to one row of k + k + k(k−1)/2 sums, no data-sized
    shuffle at all; the pair melt is a constant-size explode of the
    single result row. DECIMAL(38,0) headroom: n·Σxy needs
    n²·max|x|·max|y| ≤ 1e38 — at 1e12 rows that allows |x|,|y| up to
    ~1e7, cents-scale telemetry; the loud in-plan guard raises past it
    (exactmath.guarded rule) rather than silently overflowing."""
    from notion_spark.functions.exactmath import D38, guarded

    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"numeric_correlations needs >= 2 cols, got {cols!r}")
    base = df
    if by is not None:
        base = base.filter(F.col(by).isNotNull())
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    # per-row products in LONG (whole-stage-codegen fast path — the
    # all-DECIMAL(38,0) form ran the same scan 4x slower at sf0.1, every
    # row paying six BigDecimal multiply/convert chains), made exact by
    # the row-level bound guard: |x| <= 1e7 keeps x*y <= 1e14 inside
    # LONG. Only the per-term SUM widens to decimal (1e14-sized terms
    # over 1e12 rows -> <= 1e26, inside the decimal(30,0) a
    # sum(decimal(20,0)) carries); one long->decimal conversion per
    # term instead of three BigDecimal ops.
    d20 = "decimal(20,0)"
    _rg = guarded(
        F.greatest(*[F.abs(F.col(c)) for c in cols]) > F.lit(10_000_000),
        "numeric_correlations: |value| > 1e7 — per-row products would"
        " outgrow exact LONG arithmetic; rescale the fixed-point inputs",
    )
    sums: list = [F.count(F.lit(1)).cast(D38).alias("n")]
    for c in cols:
        x = _rg(F.col(c), "long")
        sums.append(F.sum(x.cast(d20)).cast(D38).alias(f"s_{c}"))
        sums.append(F.sum((x * F.col(c)).cast(d20)).cast(D38).alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        sums.append(
            F.sum((_rg(F.col(a), "long") * F.col(b)).cast(d20))
            .cast(D38)
            .alias(f"sp_{a}_{b}")
        )
    agg = (
        base.groupBy(F.col(by).alias("group")).agg(*sums)
        if by is not None
        else base.agg(*sums)
    )

    n = F.col("n")
    n_d = n.cast("double")
    structs = []
    for a, b in pairs:
        num = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(D38)
        den_a = (n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(D38)
        den_b = (n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(D38)
        num_d, dena_d, denb_d = (num.cast("double"), den_a.cast("double"), den_b.cast("double"))
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                n.cast("long").alias("n"),
                F.when(n >= 2, num_d / (n_d * (n_d - F.lit(1.0))))
                .otherwise(F.lit(None))
                .alias("cov"),
                F.signum(num_d).cast("int").alias("r_sign"),
                F.when(
                    (den_a > 0) & (den_b > 0), (num_d * num_d) / (dena_d * denb_d)
                )
                .otherwise(F.lit(None))
                .alias("r2"),
            )
        )
    # overflow guard: every moment product must stay inside DECIMAL(38,0);
    # the double ESTIMATE of the largest (n·Σxy / n·Σx²) triggers loudly
    worst = F.greatest(
        *[F.abs(n_d * F.col(f"ss_{c}").cast("double")) for c in cols],
        *[F.abs(n_d * F.col(f"sp_{a}_{b}").cast("double")) for a, b in pairs],
    )
    _guard = guarded(
        F.col("__worst") > F.lit(1e37),
        "numeric_correlations: moment products exceed DECIMAL(38,0) —"
        " rescale the inputs (coarser fixed-point) or profile a sample",
    )
    lead = ["group"] if by is not None else []
    melted = agg.select(
        *lead, F.explode(F.array(*structs)).alias("p"), worst.alias("__worst")
    ).select(*lead, "p.*", "__worst")
    return melted.select(
        *lead,
        "col_x",
        "col_y",
        _guard(F.col("n"), "long").alias("n"),
        _guard(F.col("cov"), "double").alias("cov"),
        _guard(F.col("r_sign"), "int").alias("r_sign"),
        _guard(F.col("r2"), "double").alias("r2"),
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


BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}
"""log10(1 + 1/d) in half-up micro-units (parts-per-million). These
nine pinned integers sum to exactly 1,000,000, so the expected
distribution is itself an exact partition — no float constant ever
enters the plan."""


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-digit (Benford's law) profile of a positive integer column
    — the data-audit pass for fabricated or truncated numeric feeds
    (real-world magnitudes follow log10(1+1/d); uniform or clipped
    generators don't). Output one row per digit 1..9: (digit, n,
    obs_ppm, expected_ppm, deviation_ppm), digits with zero rows
    included so the deviation column is always a full partition.

    Exact arithmetic end to end: the leading digit comes from the
    integer's decimal string (integer→string is exact and identical on
    any engine — never a float format or a transcendental log10 of the
    value), observed frequency is the repo's half-up micro division,
    and the expected side is the pinned `BENFORD_PPM` integers.
    Non-positive and null values are excluded (Benford is defined on
    positive magnitudes); callers pre-scale decimals to integer units.

    Scale shape: one map-side-combined groupBy over ≤ 9 keys; the
    digit extraction is per-row codegen on the scan; the 9-row
    expected frame is a literal union, joined broadcast."""
    from notion_spark.functions.exactmath import halfup_micro_div_cols

    pos = df.filter(F.col(col).isNotNull()).filter(F.col(col) > 0)
    counts = (
        pos.select(
            F.substring(F.col(col).cast("decimal(38,0)").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, ppm) for d, ppm in BENFORD_PPM.items()], "digit int, expected_ppm long"
    )
    tot = counts.agg(F.sum("n").cast("long").alias("__tot"))
    return (
        expected.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.when(
                F.col("__tot") > 0,
                halfup_micro_div_cols("coalesce(n, 0)", "__tot"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("obs_ppm"),
            "expected_ppm",
        )
        .withColumn(
            "deviation_ppm", (F.col("obs_ppm") - F.col("expected_ppm")).cast("long")
        )
    )


def tv_distance(
    df: DataFrame,
    group_col: str,
    cat_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Total-variation distance between two cohorts' categorical
    distributions — the exact drift number for "did the event-type /
    language / source mix shift?" (TV = half the L1 gap between the
    two normalized histograms; 0 = identical mix, 1e6 = disjoint).
    Single row: (n_a, n_b, n_categories, tv_micro) with

        TV = Σ_cat |n_b*c_a(cat) - n_a*c_b(cat)| / (2*n_a*n_b)

    — the cross-multiplied form keeps every term an exact integer (no
    per-category float ratios whose summation order could drift), and
    tv_micro is ONE half-up micro division. Categories present in only
    one cohort contribute their full one-sided mass. NULL categories
    are excluded; an empty cohort yields NULL.

    Scale shape: one category-keyed conditional-count groupBy
    (map-side combined, the category universe is the shuffle width)
    and a 1-row reduce; totals ride the same collapsed frame.
    """
    from notion_spark.functions.exactmath import D38
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    base = df.filter(
        F.col(group_col).isin([group_a, group_b]) & F.col(cat_col).isNotNull()
    )
    is_a = F.col(group_col) == group_a
    counts = base.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.when(is_a, F.lit(1))).cast(D38).alias("__ca"),
        F.count(F.when(~is_a, F.lit(1))).cast(D38).alias("__cb"),
    )
    agg = counts.agg(
        F.sum("__ca").cast(D38).alias("__na"),
        F.sum("__cb").cast(D38).alias("__nb"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
    )
    dev = counts.crossJoin(F.broadcast(agg)).select(
        F.abs(F.col("__nb") * F.col("__ca") - F.col("__na") * F.col("__cb"))
        .cast(D38)
        .alias("__dev")
    ).agg(F.sum("__dev").cast(D38).alias("__l1"))
    out = agg.crossJoin(F.broadcast(dev))
    return out.select(
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        "n_categories",
        F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0),
            halfup_micro_div_cols_expr(
                F.col("__l1"),
                (F.lit(2).cast(D38) * F.col("__na") * F.col("__nb")).cast(D38),
            ),
        ).alias("tv_micro"),
    )


def column_cardinalities(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Cardinality / completeness card per column — the first question
    a schema audit asks of every field: how many distinct values, how
    many nulls, is this a key, a category, or a constant. One row per
    profiled column: (column, n_rows, n_distinct, n_null,
    distinct_ratio_micro, null_ratio_micro) — ratios are exact half-up
    micro divisions over the non-null count / total.

    Scale shape: ONE aggregate — Spark compiles the k count-distincts
    into a single Expand read (k passes' worth of rows through one
    scan, the quality_key_candidates shape), map-side partial
    aggregation throughout; the per-column melt is a constant-size
    explode of the single result row. Distinct counts are EXACT (this
    is the audit surface — approx_count_distinct belongs in
    sketches.py where the error bound is the contract).
    """
    from notion_spark.functions.exactmath import D38
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    cols = list(cols)
    if not cols:
        raise ValueError("column_cardinalities: cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__d_{c}"))
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1)))
            .cast("long")
            .alias(f"__z_{c}")
        )
    agg = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__d_{c}").alias("n_distinct"),
            F.col(f"__z_{c}").alias("n_null"),
        )
        for c in cols
    ]
    melted = agg.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    nn = (F.col("n_rows") - F.col("n_null")).cast(D38)
    return melted.select(
        "column",
        "n_rows",
        "n_distinct",
        "n_null",
        F.when(
            nn > 0,
            halfup_micro_div_cols_expr(F.col("n_distinct").cast(D38), nn),
        ).alias("distinct_ratio_micro"),
        F.when(
            F.col("n_rows") > 0,
            halfup_micro_div_cols_expr(
                F.col("n_null").cast(D38), F.col("n_rows").cast(D38)
            ),
        ).alias("null_ratio_micro"),
    )
