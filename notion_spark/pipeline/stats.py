"""Inferential / concentration statistics over exact integer inputs.

The reference's analytics layer stops at descriptive aggregates
(generate_reports.py value counts, crosstabs, averages); a data team
running the same corpus at 100 TB also needs the *inferential* pass:
is this categorical pair independent (chi-square), how concentrated is
a revenue / token-budget distribution (Gini, HHI), where do the
weighted quantiles sit, did a metric shift between two cohorts (Welch
t). Every operator here follows the repo's determinism contract
(parity.py): all accumulation is exact-integer (LONG products under an
in-plan row guard, DECIMAL(38,0) sums), ratios are the shared half-up
micro division (exactmath), and the only doubles in a compared output
are single CASTs of exact integers pushed through a pinned sequence of
IEEE operations (the numeric_correlations precedent) — bit-identical
on any engine and any partitioning.

Scale notes per operator live in the docstrings; the common theme is
that nothing here ever opens a single-partition window over the data:
global ranks come from ``global_ranked`` (range repartition + local
windows + a broadcast |partitions|-row offset frame), contingency
grids are bounded by an in-plan category guard, and group quantiles
ride per-group windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.functions.exactmath import D38, guarded, halfup_micro_div_cols

__all__ = [
    "global_ranked",
    "chi_square_independence",
    "gini_coefficient",
    "hhi_index",
    "weighted_quantiles",
    "welch_ttest",
    "mann_whitney_u",
    "exact_auc",
    "ks_test",
    "rank_normalize",
    "pareto_concentration",
    "chi_square_goodness_of_fit",
    "halfup_micro_div_cols_expr",
    "cliffs_delta",
    "spearman_rho",
    "eta_squared",
    "cramers_v",
    "two_proportion_z",
    "cohens_kappa",
    "gini_by_group",
]


def global_ranked(
    df: DataFrame,
    order_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    num_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Attach a global 1-based ``rank_col`` (and, for each name in
    ``sum_cols``, an inclusive running total ``run_<name>`` in
    DECIMAL(38,0)) under the total order given by ``order_cols`` —
    WITHOUT the single-partition window that ``row_number() OVER
    (ORDER BY ...)`` compiles to.

    The distributed-rank pattern over DETERMINISTIC value buckets (the
    weighted_quantiles plan-4 idiom): bucket id = (v - min) div width,
    pure arithmetic from a broadcast 1-row (min, max) frame on the
    FIRST order column — order-preserving (equal first-key values
    always share a bucket, buckets are sorted by first key), no
    sampler, no partition id. A window *partitioned by bucket* gives
    local ranks / local running sums; a broadcast join of the
    ≤ n_buckets-row exclusive-prefix offset frame lifts them to global.
    Every window bounded by one bucket's rows — the shape that survives
    a 1000-executor sort where the naive global window serializes the
    whole table through one task.

    Why arithmetic buckets and not ``repartitionByRange`` + partition
    id (the r10 plan): the offsets branch and the data branch must
    agree on the bucket of every row. RangePartitioner SAMPLES its
    boundaries, so on an AQE exchange-reuse miss the broadcast subtree
    re-executed the range exchange with independently sampled
    boundaries and silently misaligned every offset (measured:
    spark.sql.exchange.reuse=false corrupted 14851/20000 ranks). The
    arithmetic bucket is a pure row function — both branches compute
    it identically under ANY execution, and the offsets lineage stays
    scan + map-side partial aggregate, safe to broadcast.

    Contract: the first order column must be numeric (castable to
    DECIMAL(38,0)); nulls bucket to -1 (ranked first, matching ASC
    NULLS FIRST). ``order_cols`` MUST form a total order (include a
    unique tiebreak key). Skew caveat (same as weighted_quantiles): a
    point-mass first key loads one bucket — acceptable because every
    caller ranks a value whose duplicates collapse upstream or spread
    across the numeric range. ``num_partitions`` is kept for API
    compatibility; bucket count is fixed at 4096.

    r12: the bucket id is computed in DOUBLE, not per-row
    DECIMAL(38,0) subtract/divide. That is still exact-rank-correct:
    numeric→double conversion is weakly monotone (IEEE rounding
    preserves ≤), subtracting/dividing by the two broadcast constants
    and flooring are monotone, so buckets remain order-preserving and
    equal first-key values always share a bucket; precision loss can
    only MERGE adjacent buckets (more rows under one window), never
    split or reorder — and the within-bucket window still sorts by the
    full exact order_cols. Branch-safety is untouched: the expression
    is a pure deterministic row function of the value and two
    broadcast constants, identical in the data and offsets branches
    under ANY execution. Measured (SCALE.md r12): the per-row decimal
    division was the dominant cost of the r11 swap — dropping it took
    rank_normalize at sf1 from 10.0 s to 3.0 s and gini from 5.2 s to
    2.3 s, faster than the (incorrect) r10 ranged plan on every
    consumer.
    """
    if not order_cols:
        raise ValueError("global_ranked: order_cols must be non-empty")
    del num_partitions  # r11: sampler-free buckets; kept for API compat
    n_buckets = 4096
    first = order_cols[0]
    # Deliberately NOT persisted (r12 opt, measured): three branches
    # consume this frame (bounds agg, bucketed window, offsets totals),
    # but every caller passes a narrow scan projection that is cheaper
    # to recompute than to cache — a persist here measured +20% across
    # the ten consumer queries at sf0.1 (15.3 s -> 18.4 s), the same
    # columnar-cache-build-vs-extra-pass trade minhash_dedup_pairs
    # documents. The 3x base passes are the pinned price of the
    # sampler-free branch-safe plan (VERDICT r11).
    base = df.withColumn("__gv", F.col(first).cast("double"))
    bounds = base.agg(
        F.min("__gv").alias("__glo"), F.max("__gv").alias("__ghi")
    ).select(
        "__glo",
        F.greatest(
            (F.col("__ghi") - F.col("__glo") + n_buckets) / n_buckets,
            F.lit(1.0),
        ).alias("__gwidth"),
    )
    bucketed = (
        base.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__b",
            F.when(F.col("__gv").isNull(), F.lit(-1)).otherwise(
                F.floor(
                    (F.col("__gv") - F.col("__glo")) / F.col("__gwidth")
                ).cast("int")
            ),
        )
        .drop("__gv", "__glo", "__gwidth")
    )
    wl = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    local = bucketed.withColumn("__lrn", F.row_number().over(wl))
    for c in sum_cols:
        local = local.withColumn(
            f"__lrun_{c}",
            F.sum(F.col(c).cast(D38)).over(
                wl.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    # offsets derive from the PRE-window bucketed rows: scan + 1-row
    # broadcast + map-side partial aggregate — cheap enough to
    # broadcast, and deterministic even if re-executed from scratch.
    per_b = [F.count(F.lit(1)).cast(D38).alias("__pcnt")] + [
        F.sum(F.col(c).cast(D38)).cast(D38).alias(f"__psum_{c}") for c in sum_cols
    ]
    totals = bucketed.groupBy("__b").agg(*per_b)
    # exclusive prefix over the <= n_buckets offset rows: this window
    # IS single-partition, but over a frame bounded by the bucket
    # count, never the data.
    wo = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__pcnt").over(wo), F.lit(0).cast(D38)).alias("__off_cnt"),
        *[
            F.coalesce(F.sum(f"__psum_{c}").over(wo), F.lit(0).cast(D38)).alias(
                f"__off_{c}"
            )
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "__b").withColumn(
        rank_col, (F.col("__off_cnt") + F.col("__lrn")).cast("long")
    )
    for c in sum_cols:
        out = out.withColumn(
            f"run_{c}", (F.col(f"__off_{c}") + F.col(f"__lrun_{c}")).cast(D38)
        )
    drop = ["__b", "__lrn", "__off_cnt"] + [
        x for c in sum_cols for x in (f"__lrun_{c}", f"__off_{c}")
    ]
    return out.drop(*drop)


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_categories: int = 1_000,
    max_rows: int = 200_000_000,
) -> DataFrame:
    """Pearson chi-square independence structure for two categoricals —
    the data-audit question "does priority depend on status?" that the
    reference's crosstab (generate_reports.py crosstab section) shows
    but never tests. One row per cell of the FULL margin grid (zero
    cells included — they still contribute E to the statistic):

        (a, b, observed, expected_micro, contrib_micro, dof)

    where, with N total rows, R/C the margin counts:
    expected = R*C/N and contrib = (O - E)^2 / E, both computed as ONE
    exact half-up micro division each — contrib via the algebraic form
    (N*O - R*C)^2 / (N*R*C), so no float E ever exists. Summing
    contrib_micro gives the chi-square statistic in micro-units;
    ``dof`` = (|A|-1)(|B|-1) rides every row. Null categories are
    excluded (listwise, both columns).

    Exactness bound: the contrib numerator reaches N^4, so 2e6*N^4
    must fit DECIMAL(38,0) → N ≤ ~2e8 rows; the in-plan guard raises
    past ``max_rows`` (profile a uniform sample beyond that — the
    statistic scales linearly in N anyway). ``max_categories`` bounds
    each margin frame in-plan (the interleave_order idiom), keeping
    the grid a broadcast of at most max_categories^2 rows.

    Scale shape: three map-side-combined groupBys (cells + two
    margins) over a shared scan, a broadcast grid join — no shuffle
    wider than the cell count.
    """
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull()).select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    )
    cells = base.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("observed"))
    rowm = base.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("__r"))
    colm = base.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("__c"))

    wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gcat_a = guarded(
        F.count(F.lit(1)).over(wa) > F.lit(max_categories),
        f"chi_square_independence: > {max_categories} categories in"
        f" {col_a!r} — not a categorical; bucket it first",
    )
    gcat_b = guarded(
        F.count(F.lit(1)).over(wa) > F.lit(max_categories),
        f"chi_square_independence: > {max_categories} categories in"
        f" {col_b!r} — not a categorical; bucket it first",
    )
    rowm = rowm.select(
        gcat_a(F.col("a")).alias("a"),
        gcat_a(F.col("__r"), "long").alias("__r"),
        F.count(F.lit(1)).over(wa).cast("long").alias("__na"),
    )
    colm = colm.select(
        gcat_b(F.col("b")).alias("b"),
        gcat_b(F.col("__c"), "long").alias("__c"),
        F.count(F.lit(1)).over(wa).cast("long").alias("__nb"),
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))

    grid = (
        rowm.crossJoin(F.broadcast(colm))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cells), ["a", "b"], "left")
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0).cast("long")))
    )
    grow = guarded(
        F.col("__n") > F.lit(max_rows),
        f"chi_square_independence: N > {max_rows} — the exact (N*O - R*C)^2"
        " numerator would leave DECIMAL(38,0); test a uniform sample",
    )
    n_ = F.col("__n").cast(D38)
    r_ = F.col("__r").cast(D38)
    c_ = F.col("__c").cast(D38)
    o_ = F.col("observed").cast(D38)
    dev = (n_ * o_ - r_ * c_).cast(D38)
    return grid.select(
        "a",
        "b",
        grow(F.col("observed"), "long").alias("observed"),
        grow(
            halfup_micro_div_cols_expr(r_ * c_, n_),
            "long",
        ).alias("expected_micro"),
        grow(
            halfup_micro_div_cols_expr((dev * dev).cast(D38), (n_ * r_ * c_).cast(D38)),
            "long",
        ).alias("contrib_micro"),
        ((F.col("__na") - 1) * (F.col("__nb") - 1)).cast("long").alias("dof"),
    )


def halfup_micro_div_cols_expr(num: Column, den: Column) -> Column:
    """Column-expression twin of exactmath.halfup_micro_div_cols (which
    takes column NAMES): (num/den) half-up in micro-units over already
    DECIMAL(38,0) expressions, BIGINT result. Same truncating ``div``
    contract as the SQL mirror's HUGEINT ``//``."""
    return F.call_function(
        "div", num.cast(D38) * F.lit(2000000) + den.cast(D38), den.cast(D38) * F.lit(2)
    ).cast("long")


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    key_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Gini concentration of a non-negative integer measure over units
    (revenue over customers, tokens over documents) — the one-number
    inequality summary for "is this corpus dominated by a few whales?".
    Single row: (n, total, gini_micro) with the textbook rank form

        G = (2 * Σ i*x_(i) - (n+1) * Σ x) / (n * Σ x)

    over values sorted ascending, as ONE exact half-up micro division
    of DECIMAL(38,0) integers. G is tie-invariant (equal values sum the
    same Σ i*x under any tie order), but ranks are still assigned under
    the total order (value, key) so every intermediate frame is
    reproducible.

    The scale point: the sorted rank comes from ``global_ranked`` —
    range repartition + per-partition windows + a broadcast offset
    frame — never a single-partition ORDER BY window. Headroom:
    Σ i*x ≤ n^2 * max(x); 2e6 * n^2 * max(x) ≤ 1e38 holds to a billion
    units at 1e12-cent values. Negative values raise in-plan (Gini is
    undefined); zero totals yield NULL.
    """
    gneg = guarded(
        F.col(value_col) < 0,
        f"gini_coefficient: negative {value_col!r} — Gini is defined on"
        " non-negative measures",
    )
    units = df.select(
        gneg(F.col(value_col).cast("long"), "long").alias("__x"),
        F.col(key_col).alias("__k"),
    )
    ranked = global_ranked(
        units, ["__x", "__k"], sum_cols=(), num_partitions=num_partitions,
        rank_col="__rank",
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(F.col("__x").cast(D38)).cast(D38).alias("__sx"),
        F.sum((F.col("__rank").cast(D38) * F.col("__x").cast(D38)).cast(D38))
        .cast(D38)
        .alias("__srx"),
    )
    num = (F.lit(2).cast(D38) * F.col("__srx")
           - (F.col("__n") + 1).cast(D38) * F.col("__sx")).cast(D38)
    den = (F.col("__n") * F.col("__sx")).cast(D38)
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__sx").cast("long").alias("total"),
        F.when(
            F.col("__sx") > 0, halfup_micro_div_cols_expr(num, den)
        ).alias("gini_micro"),
    )


def hhi_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl–Hirschman concentration per group — market / source /
    shard concentration of a non-negative integer measure. One row per
    group: (group, n_members, total, hhi_micro, top_share_micro) where

        HHI = Σ_s (x_s / Σx)^2  =  Σ x_s^2 / (Σx)^2

    — the right-hand form makes it ONE exact half-up micro division
    (Σx² and (Σx)² are exact DECIMAL(38,0)); hhi_micro is 1e6/n for a
    perfectly even split and 1e6 for a monopoly. top_share_micro is
    the largest single share, same division contract.

    Headroom: 2e6 * (Σx)^2 ≤ 1e38 → Σx ≤ ~2e15 per group (tens of
    trillions of cents); the in-plan guard raises past it. Scale
    shape: one map-side-combined groupBy — members arrive pre-reduced
    by the caller (one row per (group, member)), so the shuffle key is
    the group and partial aggregation does the heavy lifting.
    """
    gneg = guarded(
        F.col(value_col) < 0,
        f"hhi_index: negative {value_col!r} — shares are defined on"
        " non-negative measures",
    )
    x = gneg(F.col(value_col).cast("long"), "long")
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(x.cast(D38)).cast(D38).alias("__sx"),
        F.sum((x.cast(D38) * x.cast(D38)).cast(D38)).cast(D38).alias("__sxx"),
        F.max(x).cast(D38).alias("__mx"),
    )
    gtot = guarded(
        F.col("__sx") > F.lit(2_000_000_000_000_000),
        "hhi_index: group total > 2e15 — (Σx)^2 would leave"
        " DECIMAL(38,0); rescale the measure",
    )
    den = (F.col("__sx") * F.col("__sx")).cast(D38)
    return agg.select(
        "group",
        gtot(F.col("n_members"), "long").alias("n_members"),
        gtot(F.col("__sx"), "long").alias("total"),
        F.when(
            F.col("__sx") > 0, halfup_micro_div_cols_expr(F.col("__sxx"), den)
        ).alias("hhi_micro"),
        F.when(
            F.col("__sx") > 0,
            halfup_micro_div_cols_expr(F.col("__mx"), F.col("__sx")),
        ).alias("top_share_micro"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q_ppm: Sequence[int] = (250_000, 500_000, 750_000),
) -> DataFrame:
    """Exact weighted quantiles per group (lower-quantile convention):
    for each q in ``q_ppm`` (parts-per-million), the smallest value v
    whose inclusive cumulative weight reaches q of the group total —
    weighted medians of price by quantity, token-weighted latency
    percentiles. One row per (group, q): (group, q_ppm, value,
    total_weight).

    Entirely integer: the pick condition is cum_w * 1e6 >= q * tot_w
    in DECIMAL(38,0) — no float fraction, no interpolation, so the
    result is always an observed value and bit-identical anywhere.
    Tie-safe WITHOUT a tiebreak key: whether ANY row of a value run
    crosses the threshold depends only on the run totals, so the
    min() pick is deterministic under nondeterministic intra-tie
    order. Zero-weight rows are inert; negative weights raise in-plan.

    Scale shape — the grouped two-level prefix sum over DETERMINISTIC
    value buckets (three plans were measured before this one, see
    PLANS.md: the bare per-group window serializes a whole group
    through one task — 7.1x at 10x data with 3 groups; the
    repartitionByRange forms re-ran the wide exchange for the
    broadcast-offsets consumer and re-sampled boundaries per run —
    sf1 spread [5.2 s, 30.6 s]): (1) map-side-combined collapse to
    one row per (group, value) — point-mass data collapses to almost
    nothing; (2) bucket id = (v - min) div width, pure arithmetic
    from a broadcast 1-row (min, max) frame — order-preserving,
    deterministic, no sampler, no partition-id; (3) cumulative weight
    within each (group, bucket) via a window the collapse exchange
    already clusters for; (4) per-group exclusive prefix over the
    ≤ 4096·|groups|-row bucket-totals frame (group total rides the
    same frame), joined back broadcast. Value-CLUSTERED distributions
    can still load one bucket (bounded by distinct values per 1/4096
    of the range — collapse already removed duplicate-value mass);
    the quantile pick is a map-side |q_ppm|-ary conditional min.
    """
    gneg = guarded(
        F.col(weight_col) < 0,
        f"weighted_quantiles: negative {weight_col!r} — cumulative"
        " weight must be monotone",
    )
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    ).select(
        F.col(group_col).alias("group"),
        F.col(value_col).cast("long").alias("__v"),
        gneg(F.col(weight_col).cast("long"), "long").alias("__w"),
    )
    n_buckets = 4096
    bounds = base.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    ).select(
        "__lo",
        F.greatest(
            (F.col("__hi") - F.col("__lo") + n_buckets) / n_buckets,
            F.lit(1),
        )
        .cast("long")
        .alias("__width"),
    )
    bucketed = base.crossJoin(F.broadcast(bounds)).withColumn(
        "__b", F.expr("CAST((__v - __lo) div __width AS INT)")
    ).drop("__lo", "__width")
    collapsed = bucketed.groupBy("group", "__b", "__v").agg(
        F.sum(F.col("__w").cast(D38)).cast(D38).alias("__wv")
    )
    wl = Window.partitionBy("group", "__b").orderBy(F.asc("__v"))
    local = collapsed.withColumn(
        "__lcw", F.sum("__wv").over(wl.rowsBetween(Window.unboundedPreceding, 0))
    )
    # the offsets subtree broadcasts, so its lineage must stay CHEAP
    # (scan + map-side partial aggregate): derive bucket totals from
    # the base rows, never from the collapsed frame — a broadcast that
    # re-executes a wide exchange when AQE reuse misses was the
    # measured sf1 instability (PLANS.md)
    bucket_tot = bucketed.groupBy("group", "__b").agg(
        F.sum(F.col("__w").cast(D38)).cast(D38).alias("__bt")
    )
    wg = Window.partitionBy("group").orderBy("__b")
    offsets = bucket_tot.select(
        "group",
        "__b",
        F.coalesce(
            F.sum("__bt").over(wg.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast(D38),
        ).alias("__off"),
        F.sum("__bt")
        .over(wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast(D38)
        .alias("__tw"),
    )
    # local and offsets share the collapsed lineage (self-join by
    # plan): resolve through the parent frames, systematic_sample's
    # idiom
    cum = (
        local.join(
            F.broadcast(offsets),
            (local["__b"] == offsets["__b"])
            & local["group"].eqNullSafe(offsets["group"]),
        )
        .select(
            local["group"].alias("group"),
            local["__v"].alias("__v"),
            (offsets["__off"] + local["__lcw"]).cast(D38).alias("__cw"),
            offsets["__tw"].alias("__tw"),
        )
    )
    picks = [
        F.min(
            F.when(
                F.col("__cw") * F.lit(1_000_000)
                >= F.lit(int(q)).cast(D38) * F.col("__tw"),
                F.col("__v"),
            )
        ).alias(f"__q_{q}")
        for q in q_ppm
    ]
    agg = cum.groupBy("group").agg(
        F.max(F.col("__tw")).cast("long").alias("total_weight"), *picks
    )
    qs = F.array(
        *[
            F.struct(
                F.lit(int(q)).cast("long").alias("q_ppm"),
                F.col(f"__q_{q}").cast("long").alias("value"),
            )
            for q in q_ppm
        ]
    )
    return (
        agg.filter(F.col("total_weight") > 0)
        .select("group", "total_weight", F.explode(qs).alias("__p"))
        .select("group", F.col("__p.q_ppm").alias("q_ppm"),
                F.col("__p.value").alias("value"), "total_weight")
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t between two named cohorts of an
    integer-valued measure — the A/B shift test (did urgent orders get
    more expensive?). Single row: (n_a, n_b, mean_diff_micro, t, df_w).

    The exact core is the moment triple (n, Σx, Σx²) per cohort —
    LONG per-row products under the |x| ≤ 1e7 row guard (the
    numeric_correlations contract), DECIMAL(38,0) sums, map-side
    combined. mean_diff_micro = (n_b*Σx_a - n_a*Σx_b) / (n_a*n_b) is
    one exact half-up micro division. t and the Welch–Satterthwaite
    df are irrational, so they follow the repo's identical-IEEE-ops
    contract: each exact integer is CAST to double once, then pushed
    through a pinned sequence of IEEE ops (se² terms, one sqrt, one
    divide) that the oracle mirrors operation-for-operation —
    reproducible bit-for-bit because no accumulation happens in
    floating point. Cohorts with n < 2 or zero variance yield NULL t.

    Scale shape: one aggregate over a two-cohort filter — partial
    aggregation collapses each partition to two moment rows; nothing
    else moves.
    """
    grow = guarded(
        F.abs(F.col(value_col)) > F.lit(10_000_000),
        f"welch_ttest: |{value_col}| > 1e7 — per-row squares would leave"
        " exact LONG; rescale the fixed-point input",
    )
    d20 = "decimal(20,0)"
    base = df.filter(F.col(group_col).isin([group_a, group_b])).filter(
        F.col(value_col).isNotNull()
    )
    x = grow(F.col(value_col).cast("long"), "long")
    is_a = F.col(group_col) == group_a

    def _m(cond: Column, name: str) -> list[Column]:
        return [
            F.count(F.when(cond, F.lit(1))).cast(D38).alias(f"n_{name}"),
            F.sum(F.when(cond, x).cast(d20)).cast(D38).alias(f"s_{name}"),
            F.sum(F.when(cond, x * F.col(value_col).cast("long")).cast(d20))
            .cast(D38)
            .alias(f"ss_{name}"),
        ]

    agg = base.agg(*_m(is_a, "a"), *_m(~is_a, "b"))
    na, nb = F.col("n_a"), F.col("n_b")
    # exact integer variance numerators: n*Σx² - (Σx)²  (= n(n-1)s²)
    va = (na * F.col("ss_a") - F.col("s_a") * F.col("s_a")).cast(D38)
    vb = (nb * F.col("ss_b") - F.col("s_b") * F.col("s_b")).cast(D38)
    diff_num = (nb * F.col("s_a") - na * F.col("s_b")).cast(D38)
    # pinned IEEE sequence (each CAST is of an exact integer; the
    # oracle mirrors this sequence exactly): sea = va / (na²(na-1)),
    # seb likewise, t = diff / sqrt(sea + seb),
    # df = (sea+seb)² / (sea²/(na-1) + seb²/(nb-1))
    na_d, nb_d = na.cast("double"), nb.cast("double")
    va_d, vb_d = va.cast("double"), vb.cast("double")
    sea = va_d / (na_d * na_d * (na_d - F.lit(1.0)))
    seb = vb_d / (nb_d * nb_d * (nb_d - F.lit(1.0)))
    se2 = sea + seb
    diff_d = diff_num.cast("double") / (na_d * nb_d)
    ok = (na >= 2) & (nb >= 2) & ((va > 0) | (vb > 0))
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when(
            (na > 0) & (nb > 0),
            halfup_micro_div_cols_expr(diff_num, (na * nb).cast(D38)),
        ).alias("mean_diff_micro"),
        F.when(ok, diff_d / F.sqrt(se2)).alias("t"),
        F.when(
            ok & (sea + seb > 0),
            (se2 * se2)
            / (sea * sea / (na_d - F.lit(1.0)) + seb * seb / (nb_d - F.lit(1.0))),
        ).alias("df_w"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between two named cohorts —
    the distribution-free sibling of `welch_ttest` for skewed measures
    (latencies, prices, token counts) where a mean test misleads.
    Single row: (n_a, n_b, u_a_x2, u_b_x2, tie_term, z).

    Everything is EXACT integers except the final z: ranks are
    midranks over the combined sample, carried DOUBLED so ties never
    produce a half — for a value with total count c and P rows below
    it, 2*midrank = 2P + c + 1 exactly; u_a_x2 = Σ c_a*(2P+c+1)
    - n_a*(n_a+1) is 2*U_a, and u_a_x2 + u_b_x2 == 2*n_a*n_b by
    identity (unit-pinned). tie_term = Σ(c³-c) feeds the tie-corrected
    normal approximation; z follows the identical-IEEE-ops contract
    (single casts of exact integers, pinned op sequence with one
    sqrt): z = (u_a_x2 - n_a*n_b) / (2*sqrt(var)),
    var = (n_a*n_b/12)*((N+1) - T/(N*(N-1))). All-tied samples have
    var 0 → NULL z.

    Scale shape: one value-keyed groupBy collapses the data to the
    distinct-value frame; cumulative counts over that frame come from
    ``global_ranked`` (range repartition + pid windows + broadcast
    offsets — never a single-partition ORDER BY window, because a
    near-continuous measure has ~N distinct values); one final
    aggregate. DECIMAL(38,0) headroom: rank products ≤ ~2N², tie cubes
    ≤ N³ — fine past 1e9 rows; u*_x2 is returned as BIGINT under an
    in-plan n_a*n_b ≤ 4.5e18 guard.
    """
    base = df.filter(F.col(group_col).isin([group_a, group_b])).filter(
        F.col(value_col).isNotNull()
    )
    agg = _doubled_midrank_moments(
        base, F.col(group_col) == group_a, value_col, num_partitions
    )
    na, nb = F.col("__na"), F.col("__nb")
    u2a = (F.col("__r2a") - na * (na + 1)).cast(D38)
    u2b = (F.col("__r2b") - nb * (nb + 1)).cast(D38)
    gprod = guarded(
        (na * nb).cast(D38) > F.lit(4_500_000_000_000_000_000).cast(D38),
        "mann_whitney_u: n_a*n_b > 4.5e18 — doubled U would leave BIGINT;"
        " test a uniform sample",
    )
    n_ = (na + nb).cast(D38)
    # pinned IEEE sequence (oracle mirrors op-for-op)
    na_d, nb_d, n_d = na.cast("double"), nb.cast("double"), n_.cast("double")
    t_d = F.col("__t").cast("double")
    u2a_d = u2a.cast("double")
    var = (na_d * nb_d / F.lit(12.0)) * (
        (n_d + F.lit(1.0)) - t_d / (n_d * (n_d - F.lit(1.0)))
    )
    ok = (na >= 1) & (nb >= 1) & (n_ >= 2)
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        gprod(u2a, "long").alias("u_a_x2"),
        gprod(u2b, "long").alias("u_b_x2"),
        F.col("__t").cast("long").alias("tie_term"),
        F.when(ok & (var > 0), (u2a_d - na_d * nb_d) / (F.lit(2.0) * F.sqrt(var)))
        .alias("z"),
    )


def _doubled_midrank_moments(
    base: DataFrame,
    is_a: Column,
    value_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Shared rank-sum core (Mann–Whitney / exact AUC): collapse to the
    distinct-value frame with per-cohort counts, rank it with the
    distributed ``global_ranked``, and reduce to the doubled-midrank
    moment row (__na, __nb, __r2a, __r2b, __t) — 2*midrank = 2P + c + 1
    keeps tied ranks exact integers; __t = Σ(c³ - c) is the tie term."""
    counts = base.groupBy(F.col(value_col).cast("long").alias("__v")).agg(
        F.count(F.when(is_a, F.lit(1))).cast(D38).alias("__ca"),
        F.count(F.when(~is_a, F.lit(1))).cast(D38).alias("__cb"),
    ).withColumn("__c", (F.col("__ca") + F.col("__cb")).cast(D38))
    ranked = global_ranked(
        counts, ["__v"], sum_cols=["__c"], num_partitions=num_partitions,
        rank_col="__rnk",
    )
    # P = rows strictly below this value; 2*midrank = 2P + c + 1
    two_mid = (
        (F.col("run___c") - F.col("__c")) * 2 + F.col("__c") + 1
    ).cast(D38)
    return ranked.agg(
        F.sum(F.col("__ca")).cast(D38).alias("__na"),
        F.sum(F.col("__cb")).cast(D38).alias("__nb"),
        F.sum((F.col("__ca") * two_mid).cast(D38)).cast(D38).alias("__r2a"),
        F.sum((F.col("__cb") * two_mid).cast(D38)).cast(D38).alias("__r2b"),
        F.sum((F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")).cast(D38))
        .cast(D38)
        .alias("__t"),
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC AUC of an integer-valued score against a boolean
    label — the classifier-quality gate a training-data pipeline runs
    over its quality/toxicity/language scorers at corpus scale, where
    a sampled sklearn AUC answers for the sample only. Single row:
    (n_pos, n_neg, auc_micro).

    AUC is EXACTLY the rank-sum statistic: AUC = U_pos/(n_pos*n_neg)
    with midrank tie handling (each tied pair contributes 1/2) — so it
    reuses the doubled-midrank core and auc_micro =
    halfup(u2_pos, 2*n_pos*n_neg) is one exact half-up micro division
    of exact integers: bit-identical on any engine/partitioning, no
    trapezoid float sums, no score sorting in one task (the
    distinct-score frame is ranked by the distributed global_ranked).
    NULL scores/labels are excluded; a single-class input yields NULL
    auc. Degenerate (constant) scorers land at exactly 500000.
    """
    base = df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    agg = _doubled_midrank_moments(
        base, F.col(label_col).cast("boolean"), score_col, num_partitions
    )
    na, nb = F.col("__na"), F.col("__nb")
    u2a = (F.col("__r2a") - na * (na + 1)).cast(D38)
    return agg.select(
        na.cast("long").alias("n_pos"),
        nb.cast("long").alias("n_neg"),
        F.when(
            (na > 0) & (nb > 0),
            halfup_micro_div_cols_expr(u2a, (2 * na * nb).cast(D38)),
        ).alias("auc_micro"),
    )


def ks_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between two named
    cohorts of an integer-valued measure — the distribution-drift gate
    (did this source's length/price/score distribution move?) that
    compares WHOLE CDFs where mean tests see nothing. Single row:
    (n_a, n_b, d_micro, ks_at_value) with

        D = max over values v of |F_a(v) - F_b(v)|

    computed exactly: the per-value cumulative counts come from ONE
    ``global_ranked`` pass over the distinct-value frame (cum_a, cum_b
    as running sums), the per-value deviation is the exact integer
    |n_b*cum_a - n_a*cum_b|, and d_micro = halfup(max_dev, n_a*n_b) is
    one half-up micro division. ``ks_at_value`` is the smallest value
    attaining the max (max_by over a (dev, -v) struct — deterministic
    under ties). Empty cohorts yield NULL d.

    Scale shape: value-keyed collapse (map-side combined), the
    distributed rank pass, one final aggregate. Headroom:
    n_b*cum_a ≤ n², far inside DECIMAL(38,0) at any row count whose
    n_a*n_b fits the micro division (in-plan guard at 4.5e18).
    """
    base = df.filter(F.col(group_col).isin([group_a, group_b])).filter(
        F.col(value_col).isNotNull()
    )
    is_a = F.col(group_col) == group_a
    counts = base.groupBy(F.col(value_col).cast("long").alias("__v")).agg(
        F.count(F.when(is_a, F.lit(1))).cast(D38).alias("__ca"),
        F.count(F.when(~is_a, F.lit(1))).cast(D38).alias("__cb"),
    )
    ranked = global_ranked(
        counts, ["__v"], sum_cols=["__ca", "__cb"],
        num_partitions=num_partitions, rank_col="__rnk",
    )
    tot = base.agg(
        F.count(F.when(is_a, F.lit(1))).cast(D38).alias("__na"),
        F.count(F.when(~is_a, F.lit(1))).cast(D38).alias("__nb"),
    )
    dev = F.abs(
        (F.col("__nb") * F.col("run___ca") - F.col("__na") * F.col("run___cb"))
    ).cast(D38)
    staged = ranked.crossJoin(F.broadcast(tot)).select(
        "__v", F.col("__na"), F.col("__nb"), dev.alias("__dev")
    )
    gprod = guarded(
        (F.col("__na") * F.col("__nb")).cast(D38)
        > F.lit(4_500_000_000_000_000_000).cast(D38),
        "ks_test: n_a*n_b > 4.5e18 — the micro division would leave"
        " BIGINT; test a uniform sample",
    )
    agg = staged.groupBy().agg(
        F.max("__na").cast(D38).alias("__na"),
        F.max("__nb").cast(D38).alias("__nb"),
        F.max("__dev").cast(D38).alias("__dmax"),
        F.expr(
            "max_by(__v, named_struct('d', CAST(__dev AS DECIMAL(38,0)),"
            " 'negv', -__v))"
        ).alias("__at"),
    )
    ok = (F.col("__na") > 0) & (F.col("__nb") > 0)
    return agg.select(
        gprod(F.col("__na"), "long").alias("n_a"),
        gprod(F.col("__nb"), "long").alias("n_b"),
        F.when(
            ok,
            halfup_micro_div_cols_expr(
                F.col("__dmax"), (F.col("__na") * F.col("__nb")).cast(D38)
            ),
        ).alias("d_micro"),
        F.when(ok, F.col("__at").cast("long")).alias("ks_at_value"),
    )


def rank_normalize(
    df: DataFrame,
    col: str,
    out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable empirical-CDF rank transform — `curation.quantile_rank`
    without its bounded-cardinality guard: the same
    frac6_half_up(#rows <= value, N) max-rank fraction (equal values
    share one rank, bit-identical anywhere), but the cumulative counts
    come from the distributed ``global_ranked`` instead of a window
    over a broadcast-sized distinct frame — so a CONTINUOUS feature
    (price cents, latency, score) with ~N distinct values rank-
    normalizes without a single-partition sort or a guard raise.

    Output: input + ``out`` (default ``<col>_qrank`` in (0, 1],
    double); NULL values rank NULL. The join back onto the input is a
    value-keyed hash join (AQE broadcasts it when the distinct frame
    is small — exactly when the quantile_rank variant applies); the
    total-count frame broadcasts from a scan-only subtree (the cheap-
    broadcast rule, PLANS.md).
    """
    from notion_spark.pipeline.text_analysis import frac6_half_up

    out = out or f"{col}_qrank"
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__value"))
        .agg(F.count(F.lit(1)).cast(D38).alias("__cnt"))
    )
    ranked = global_ranked(
        counts, ["__value"], sum_cols=["__cnt"],
        num_partitions=num_partitions, rank_col="__rnk",
    )
    total = df.filter(F.col(col).isNotNull()).agg(
        F.count(F.lit(1)).cast(D38).alias("__n")
    )
    ranks = ranked.crossJoin(F.broadcast(total)).select(
        "__value",
        frac6_half_up(F.col("run___cnt"), F.col("__n")).alias(out),
    )
    return df.join(
        ranks, F.col(col).eqNullSafe(F.col("__value")), "left"
    ).drop("__value")


def pareto_concentration(
    df: DataFrame,
    value_col: str,
    key_col: str,
    thresholds_ppm: Sequence[int] = (500_000, 800_000, 900_000),
    num_partitions: int | None = None,
) -> DataFrame:
    """Pareto / 80-20 concentration: the SMALLEST number of units whose
    combined measure reaches each threshold share of the total — "how
    many customers make 80% of revenue", the operational companion to
    `gini_coefficient`'s one-number summary. One row per threshold:

        (threshold_ppm, n_top_units, n_units, units_share_ppm)

    where units are ranked by measure DESCENDING (ties broken by key)
    and the pick condition cum·1e6 ≥ thr·total is entirely exact
    integers; units_share_ppm is the half-up micro fraction
    n_top_units / n_units. Ranks and running sums come from the
    distributed ``global_ranked`` (descending order via the negated
    measure — the primitive is ascending-only), so no single-partition
    sort exists. Non-negative measures only (in-plan guard); zero
    totals yield no rows.
    """
    gneg = guarded(
        F.col(value_col) < 0,
        f"pareto_concentration: negative {value_col!r} — shares are"
        " defined on non-negative measures",
    )
    units = df.select(
        gneg(F.col(value_col).cast("long"), "long").alias("__x"),
        F.col(key_col).alias("__k"),
    ).withColumn("__negx", -F.col("__x"))
    ranked = global_ranked(
        units, ["__negx", "__k"], sum_cols=["__x"],
        num_partitions=num_partitions, rank_col="__rnk",
    )
    picks = []
    for t in thresholds_ppm:
        picks.append(
            F.min(
                F.when(
                    F.col("run___x") * F.lit(1_000_000)
                    >= F.lit(int(t)).cast(D38) * F.col("__tot"),
                    F.col("__rnk"),
                )
            ).alias(f"__p_{t}")
        )
    tot = df.agg(
        F.sum(F.col(value_col).cast(D38)).cast(D38).alias("__tot"),
        F.count(F.lit(1)).cast("long").alias("n_units"),
    )
    agg = ranked.crossJoin(F.broadcast(tot)).agg(
        F.max("__tot").alias("__tot"),
        F.max("n_units").cast("long").alias("n_units"),
        *picks,
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(int(t)).cast("long").alias("threshold_ppm"),
                F.col(f"__p_{t}").cast("long").alias("n_top_units"),
            )
            for t in thresholds_ppm
        ]
    )
    return (
        agg.filter(F.col("__tot") > 0)
        .select("n_units", F.explode(rows).alias("__r"))
        .select(
            F.col("__r.threshold_ppm").alias("threshold_ppm"),
            F.col("__r.n_top_units").alias("n_top_units"),
            "n_units",
            halfup_micro_div_cols_expr(
                F.col("__r.n_top_units").cast(D38), F.col("n_units").cast(D38)
            ).alias("units_share_ppm"),
        )
    )


def chi_square_goodness_of_fit(
    df: DataFrame,
    cat_col: str,
    expected_ppm: dict,
    max_rows: int = 200_000_000,
) -> DataFrame:
    """One-way chi-square goodness-of-fit against DESIGN ratios — the
    sample-ratio-mismatch (SRM) gate every experimentation platform
    runs before trusting an A/B readout, and the mix-vs-spec audit for
    ingest feeds. ``expected_ppm`` maps each expected category to its
    design share in ppm (must sum to exactly 1,000,000 — validated).
    One row per expected category, plus observed categories OUTSIDE
    the design (their expected share is 0 and ``off_design`` is true —
    a hard SRM failure on its own):

        (category, observed, expected_micro, contrib_micro, dof,
         off_design)

    Exact arithmetic: expected count = ppm*N/1e6 and contribution
    (O-E)²/E = (1e6*O - ppm*N)² / (1e6*ppm*N), each ONE half-up micro
    division of exact integers — no float expected count exists.
    dof = |design| - 1 rides every row; off-design rows carry NULL
    expected/contrib (their evidence is their existence, not a ratio).

    Exactness bound: the contrib numerator reaches (1e6*N)², so the
    in-plan guard raises past ``max_rows`` (same budget as the
    independence test). Scale shape: one map-side-combined groupBy
    over the category universe + a broadcast literal design frame.
    """
    if not expected_ppm:
        raise ValueError("chi_square_goodness_of_fit: expected_ppm is empty")
    total_ppm = sum(int(v) for v in expected_ppm.values())
    if total_ppm != 1_000_000:
        raise ValueError(
            "chi_square_goodness_of_fit: expected_ppm must sum to exactly"
            f" 1000000, got {total_ppm}"
        )
    if any(int(v) <= 0 for v in expected_ppm.values()):
        raise ValueError("chi_square_goodness_of_fit: shares must be > 0")
    spark = df.sparkSession
    design = spark.createDataFrame(
        [(str(k), int(v)) for k, v in sorted(expected_ppm.items())],
        "category string, __ppm long",
    )
    base = df.filter(F.col(cat_col).isNotNull()).select(
        F.col(cat_col).cast("string").alias("category")
    )
    counts = base.groupBy("category").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    grid = (
        design.join(counts, "category", "full_outer")
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(tot))
    )
    grow = guarded(
        F.col("__n") > F.lit(max_rows),
        f"chi_square_goodness_of_fit: N > {max_rows} — the exact"
        " (1e6*O - ppm*N)^2 numerator would leave DECIMAL(38,0); test a"
        " uniform sample",
    )
    n_ = F.col("__n").cast(D38)
    o_ = F.col("observed").cast(D38)
    ppm_ = F.col("__ppm").cast(D38)
    dev = (F.lit(1_000_000).cast(D38) * o_ - ppm_ * n_).cast(D38)
    in_design = F.col("__ppm").isNotNull()
    return grid.select(
        "category",
        grow(F.col("observed"), "long").alias("observed"),
        F.when(
            in_design, grow(halfup_micro_div_cols_expr(ppm_ * n_, F.lit(1_000_000).cast(D38)), "long")
        ).alias("expected_micro"),
        F.when(
            in_design,
            grow(
                halfup_micro_div_cols_expr(
                    (dev * dev).cast(D38),
                    (F.lit(1_000_000).cast(D38) * ppm_ * n_).cast(D38),
                ),
                "long",
            ),
        ).alias("contrib_micro"),
        F.lit(len(expected_ppm) - 1).cast("long").alias("dof"),
        (~in_design).alias("off_design"),
    )


def cliffs_delta(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cliff's delta between two named cohorts — the EFFECT SIZE the
    Mann–Whitney test omits: P(a > b) − P(a < b) over all cross-cohort
    pairs, in [−1, 1]. A significance test says a shift exists; delta
    says whether anyone should care. Single row:
    (n_a, n_b, delta_micro, magnitude).

    Entirely exact: delta = (2·U_a − n_a·n_b)/(n_a·n_b) with midrank
    tie handling (each tied pair contributes 0 to the numerator), and
    2·U_a is already an exact integer from the shared doubled-midrank
    core — delta_micro is ONE half-up micro division. ``magnitude`` is
    the standard Romano et al. label from pinned micro thresholds
    (|d| < 147000 negligible, < 330000 small, < 474000 medium, else
    large) — compared in exact integers, so the label can never flap
    on float noise. Empty cohorts yield NULL delta.

    Scale shape: identical to `mann_whitney_u` (one value-keyed
    collapse, distributed rank over the distinct-value frame, one
    reduce) — the two should be read together off one certification.
    """
    base = df.filter(F.col(group_col).isin([group_a, group_b])).filter(
        F.col(value_col).isNotNull()
    )
    agg = _doubled_midrank_moments(
        base, F.col(group_col) == group_a, value_col, num_partitions
    )
    na, nb = F.col("__na"), F.col("__nb")
    u2a = (F.col("__r2a") - na * (na + 1)).cast(D38)
    gprod = guarded(
        (na * nb).cast(D38) > F.lit(4_500_000_000_000_000_000).cast(D38),
        "cliffs_delta: n_a*n_b > 4.5e18 — the doubled numerator would"
        " leave BIGINT; test a uniform sample",
    )
    ok = (na >= 1) & (nb >= 1)
    delta = F.when(
        ok,
        gprod(
            halfup_micro_div_cols_expr(
                (u2a - (na * nb).cast(D38)).cast(D38), (na * nb).cast(D38)
            ),
            "long",
        ),
    )
    mag = F.when(delta.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.abs(delta) < 147_000, F.lit("negligible"))
        .when(F.abs(delta) < 330_000, F.lit("small"))
        .when(F.abs(delta) < 474_000, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        delta.alias("delta_micro"),
        mag.alias("magnitude"),
    )


def spearman_rho(
    df: DataFrame,
    col_x: str,
    col_y: str,
    num_partitions: int | None = None,
    max_rows: int = 1_500_000_000,
) -> DataFrame:
    """Spearman rank correlation structure between two integer-valued
    columns — Pearson on midranks: the monotone-association number
    that survives the skew and outliers that wreck raw-value Pearson.
    Single row: (n, rho_sign, rho2) — the `numeric_correlations`
    exact surface (rho itself needs a sqrt, so the hashable output is
    its sign plus its square; rho = rho_sign * sqrt(rho2)).

    Exactness: midranks per column come from the shared
    doubled-midrank construction (2·midrank = 2P + c + 1 over the
    distinct-value frame — ties exact, never a half), joined back to
    the rows by value. Per-row rank products stay in LONG (the
    numeric_correlations rule: whole-stage-codegen multiplies, one
    long→decimal conversion per SUM term — the all-DECIMAL(38,0) form
    measured 2x the whole query at sf1), widened to decimal(20,0)
    only at the sum; exact because 2N+1 ≤ 3e9 keeps every product
    under 9e18 — the in-plan guard raises past ``max_rows`` (1.5e9)
    rows. num = n·Σxy − Σx·Σy and the two denominators are exact
    integers CAST ONCE to double, and rho2 = num²/(den_x·den_y) is a
    single IEEE multiply/divide of those identical doubles. Listwise
    null handling; constant columns yield NULL rho2.

    Scale shape: two value-keyed collapses (bounded by distinct
    values), two distributed ranks over those collapsed frames, two
    value-keyed join-backs to the rows, ONE global moment aggregate —
    no data-sized window anywhere.
    """
    base = df.filter(
        F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
    ).select(
        F.col(col_x).cast("long").alias("__x"),
        F.col(col_y).cast("long").alias("__y"),
    )

    def ranks_of(col: str, out: str) -> DataFrame:
        counts = base.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).cast(D38).alias("__c")
        )
        ranked = global_ranked(
            counts, ["__v"], sum_cols=["__c"], num_partitions=num_partitions,
            rank_col="__rk",
        )
        # LONG doubled midrank: exact under the max_rows guard (2N+1
        # <= 3e9), and LONG products stay inside whole-stage codegen
        two_mid = (
            (F.col("run___c") - F.col("__c")) * 2 + F.col("__c") + 1
        ).cast("long")
        return ranked.select(F.col("__v").alias(col), two_mid.alias(out))

    joined = base.join(ranks_of("__x", "__rx"), "__x").join(
        ranks_of("__y", "__ry"), "__y"
    )
    d20 = "decimal(20,0)"
    agg = joined.agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(F.col("__rx").cast(d20)).cast(D38).alias("__sx"),
        F.sum(F.col("__ry").cast(d20)).cast(D38).alias("__sy"),
        F.sum((F.col("__rx") * F.col("__rx")).cast(d20)).cast(D38).alias("__sxx"),
        F.sum((F.col("__ry") * F.col("__ry")).cast(d20)).cast(D38).alias("__syy"),
        F.sum((F.col("__rx") * F.col("__ry")).cast(d20)).cast(D38).alias("__sxy"),
    )
    gbig = guarded(
        F.col("__n") > F.lit(max_rows),
        f"spearman_rho: n > {max_rows} — doubled-rank LONG products"
        " would wrap past 2N+1 = 3e9; rank-correlate a uniform sample",
    )
    n_ = F.col("__n")
    num = (n_ * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(D38)
    den_x = (n_ * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(D38)
    den_y = (n_ * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(D38)
    num_d = num.cast("double")
    ok = (n_ >= 2) & (den_x > 0) & (den_y > 0)
    return agg.select(
        gbig(n_, "long").alias("n"),
        F.when(ok, F.signum(num_d).cast("long")).alias("rho_sign"),
        F.when(
            ok, (num_d * num_d) / (den_x.cast("double") * den_y.cast("double"))
        ).alias("rho2"),
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_categories: int = 1_000,
    max_rows: int = 200_000_000,
) -> DataFrame:
    """Cramér's V structure for two categoricals — the normalized
    [0, 1] effect size on top of `chi_square_independence`: a 1e9-row
    crosstab always "rejects independence"; V says whether the
    association is furniture or signal. Single row:
    (n, r_categories, c_categories, chi2_micro, v2_micro) where
    V² = χ²/(N·(min(R,C)−1)) and v2_micro is one exact half-up
    division of the already-exact chi2_micro (V itself needs a sqrt —
    the hashable surface is V², the `numeric_correlations` rule).

    Scale shape: the per-cell chi-square grid (bounded by
    ``max_categories``² broadcastable rows) reduced by one aggregate;
    all exactness bounds inherit from `chi_square_independence`.
    Degenerate margins (R < 2 or C < 2) yield NULL v2_micro.
    """
    cells = chi_square_independence(
        df, col_a, col_b, max_categories=max_categories, max_rows=max_rows
    )
    agg = cells.agg(
        F.sum(F.col("observed").cast(D38)).cast(D38).alias("__n"),
        F.countDistinct(F.col("a")).cast(D38).alias("__r"),
        F.countDistinct(F.col("b")).cast(D38).alias("__c"),
        F.sum(F.col("contrib_micro").cast(D38)).cast(D38).alias("__chi2"),
    )
    mind = (F.least(F.col("__r"), F.col("__c")) - 1).cast(D38)
    ok = mind >= 1
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__r").cast("long").alias("r_categories"),
        F.col("__c").cast("long").alias("c_categories"),
        F.col("__chi2").cast("long").alias("chi2_micro"),
        F.when(
            ok & (F.col("__n") > 0),
            halfup_micro_div_cols_expr(
                F.col("__chi2"),
                (F.col("__n") * mind * F.lit(1_000_000).cast(D38)).cast(D38),
            ),
        ).alias("v2_micro"),
    )


def two_proportion_z(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-proportion z structure between two named cohorts — the
    conversion-rate A/B readout: success shares per cohort, their
    difference, and the pooled z. Single row: (n_a, x_a, n_b, x_b,
    p_a_micro, p_b_micro, diff_micro, z).

    The proportions and their difference are exact half-up micro
    divisions of exact counts; z follows the identical-IEEE-ops
    contract (exact integers cast once to double, pinned op sequence
    with one sqrt): z = (pa − pb)/sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with
    the pooled p̂ = (x_a+x_b)/(n_a+n_b) — all four inputs to the
    doubles are the exact counts. Degenerate pools (p̂ ∈ {0,1}) or an
    empty cohort yield NULL z. ``success_col`` is any boolean-castable
    column; NULL successes are excluded (they are neither success nor
    failure — half-counting them would bias both shares).

    Scale shape: ONE map-side-combined aggregate over the scan — four
    conditional counts, no shuffle wider than one row.
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(success_col).isNotNull()
    )
    is_a = F.col(group_col) == group_a
    s = F.col(success_col).cast("boolean")
    agg = base.agg(
        F.count(F.when(is_a, F.lit(1))).cast(D38).alias("__na"),
        F.count(F.when(is_a & s, F.lit(1))).cast(D38).alias("__xa"),
        F.count(F.when(~is_a, F.lit(1))).cast(D38).alias("__nb"),
        F.count(F.when(~is_a & s, F.lit(1))).cast(D38).alias("__xb"),
    )
    na, xa, nb, xb = (F.col(c) for c in ("__na", "__xa", "__nb", "__xb"))
    pa = F.when(na > 0, halfup_micro_div_cols_expr(xa.cast(D38), na.cast(D38)))
    pb = F.when(nb > 0, halfup_micro_div_cols_expr(xb.cast(D38), nb.cast(D38)))
    # pinned IEEE sequence (oracle mirrors op-for-op)
    na_d, xa_d = na.cast("double"), xa.cast("double")
    nb_d, xb_d = nb.cast("double"), xb.cast("double")
    pool = (xa_d + xb_d) / (na_d + nb_d)
    se2 = pool * (F.lit(1.0) - pool) * (
        F.lit(1.0) / na_d + F.lit(1.0) / nb_d
    )
    ok = (na > 0) & (nb > 0)
    return agg.select(
        na.cast("long").alias("n_a"),
        xa.cast("long").alias("x_a"),
        nb.cast("long").alias("n_b"),
        xb.cast("long").alias("x_b"),
        pa.alias("p_a_micro"),
        pb.alias("p_b_micro"),
        F.when(ok, pa - pb).cast("long").alias("diff_micro"),
        F.when(ok & (se2 > 0), (xa_d / na_d - xb_d / nb_d) / F.sqrt(se2)).alias(
            "z"
        ),
    )


def eta_squared(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_rows: int = 200_000_000,
) -> DataFrame:
    """One-way ANOVA effect size η² — how much of an integer measure's
    variance the grouping explains: the "does source/language/segment
    matter AT ALL" number behind every crosstab deep-dive (Welch t
    compares two named cohorts; this scores the whole partition).
    Single row: (n, k_groups, eta2_micro).

    η² = SS_between/SS_total with SS_between = Σ_g S_g²/n_g − S²/N
    and SS_total = Σx² − S²/N — rational terms with per-group
    denominators, so the exact surface is built from per-term half-up
    MICRO divisions (each S_g²/n_g and S²/N rounded half-up to micro
    units, then summed): deterministic on any engine and partitioning
    by construction, with |error| ≤ (k+1)/2 micro-units — documented
    micro-unit semantics, the dow-profile/share precedent, never a
    float accumulation. Degenerate inputs (constant values, n < 2)
    yield NULL eta2. The S_g² numerators bound exactness:
    N·max|x| ≤ ~1e16 under the ``max_rows``/1e7-value guard pair
    (|x| ≤ 1e7, the numeric_correlations contract).

    Scale shape: ONE map-side-combined groupBy to the |groups| frame
    + one reduce over it — no join, no window, no second scan.
    """
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("long").alias("__x"),
    )
    gmag = guarded(
        F.abs(F.col("__x")) > F.lit(10_000_000),
        "eta_squared: |value| > 1e7 — per-row squares would outgrow"
        " exact LONG arithmetic; rescale the fixed-point input",
    )
    per_g = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(gmag(F.col("__x"), "long").cast("decimal(20,0)"))
        .cast(D38)
        .alias("__s"),
        F.sum((F.col("__x") * F.col("__x")).cast("decimal(20,0)"))
        .cast(D38)
        .alias("__ss"),
    )
    grow = guarded(
        F.sum("__n").cast(D38) > F.lit(max_rows),
        f"eta_squared: N > {max_rows} — S² would leave DECIMAL(38,0);"
        " score a uniform sample",
    )
    agg = per_g.agg(
        grow(F.sum("__n").cast(D38)).alias("__N"),
        F.sum("__s").cast(D38).alias("__S"),
        F.sum("__ss").cast(D38).alias("__SS"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        # Σ_g halfup_micro(S_g², n_g): per-term micro division summed —
        # exact integers all the way
        F.sum(
            halfup_micro_div_cols_expr(
                (F.col("__s") * F.col("__s")).cast(D38), F.col("__n")
            ).cast(D38)
        )
        .cast(D38)
        .alias("__sb_micro"),
    )
    grand_micro = halfup_micro_div_cols_expr(
        (F.col("__S") * F.col("__S")).cast(D38), F.col("__N")
    ).cast(D38)
    ss_total_micro = (
        F.col("__SS") * F.lit(1_000_000).cast(D38) - grand_micro
    ).cast(D38)
    # per-term rounding can leave a tiny negative between-mass on a
    # zero-effect partition — clamp (identically on both engines)
    ss_between_micro = F.greatest(
        (F.col("__sb_micro") - grand_micro).cast(D38), F.lit(0).cast(D38)
    )
    ok = (F.col("__N") >= 2) & (ss_total_micro > 0)
    return agg.select(
        F.col("__N").cast("long").alias("n"),
        "k_groups",
        F.when(
            ok,
            halfup_micro_div_cols_expr(ss_between_micro, ss_total_micro),
        ).alias("eta2_micro"),
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_categories: int = 1_000,
    max_rows: int = 200_000_000,
) -> DataFrame:
    """Cohen's kappa agreement between two categorical columns over a
    shared label space — the inter-rater / model-vs-heuristic
    agreement readout chance-corrected for marginal prevalence (raw
    percent-agreement rewards majority-class collapse; kappa is the
    honest number a labeling pipeline reports). Single row:

        (n, n_agree, po_micro, pe_micro, kappa_micro)

    with po = agree/n, pe = Σ_c ma_c·mb_c / n², and

        kappa = (po − pe) / (1 − pe)
              = (n·agree − Σ ma·mb) / (n² − Σ ma·mb)

    — the algebraic form makes kappa ONE exact half-up micro division
    of DECIMAL(38,0) integers (no float po/pe ever exists; po_micro /
    pe_micro ride along as their own single divisions). Listwise null
    handling. Degenerate case pe = 1 (both raters constant on the
    same label) yields NULL kappa.

    Exactness bound: Σ ma·mb ≤ n², so 2e6·n² must fit DECIMAL(38,0)
    → the in-plan guard raises past ``max_rows`` (2e8 rows, same
    budget as chi_square). ``max_categories`` bounds each margin
    frame in-plan (the chi_square idiom), keeping the margin join a
    broadcast of bounded rows.

    Scale shape: three map-side-combined aggregates over a shared
    scan (agree count + two margins) and one bounded-row margin join
    on the category key — no shuffle wider than the category count.

    Reference parity: extends the reference's descriptive crosstab
    (generate_reports.py crosstab section) with the agreement
    statistic it motivates; no reference analogue.
    """
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gcat = guarded(
        F.count(F.lit(1)).over(wa) > F.lit(max_categories),
        f"cohens_kappa: more than {max_categories} categories — the"
        " margin join is bounded in-plan; collapse the label space"
        " upstream or raise max_categories",
    )
    grow = guarded(
        F.col("__n") > max_rows,
        f"cohens_kappa: more than {max_rows} rows — 2e6·n² must fit"
        " DECIMAL(38,0); aggregate or sample upstream",
    )
    totals = base.agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast(D38)
        .alias("__agree"),
    ).select(grow(F.col("__n"), D38).alias("__n"), "__agree")
    ma = base.groupBy("a").agg(F.count(F.lit(1)).cast(D38).alias("__ma"))
    # the guard window runs over the COLLAPSED margin frame (one row
    # per category), so the single-partition frame it opens is bounded
    # by the very cardinality it polices — the chi_square idiom.
    ma = ma.select("a", gcat(F.col("__ma"), D38).alias("__ma"))
    mb = base.groupBy("b").agg(F.count(F.lit(1)).cast(D38).alias("__mb"))
    chance = (
        ma.join(mb, ma["a"] == mb["b"], "inner")
        .select((F.col("__ma") * F.col("__mb")).cast(D38).alias("__p"))
        .agg(F.coalesce(F.sum("__p"), F.lit(0)).cast(D38).alias("__sum_mm"))
    )
    agg = totals.crossJoin(F.broadcast(chance))
    n2 = (F.col("__n") * F.col("__n")).cast(D38)
    num = (F.col("__n") * F.col("__agree") - F.col("__sum_mm")).cast(D38)
    den = (n2 - F.col("__sum_mm")).cast(D38)
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__agree").cast("long").alias("n_agree"),
        F.when(
            F.col("__n") > 0,
            halfup_micro_div_cols_expr(F.col("__agree"), F.col("__n")),
        ).alias("po_micro"),
        F.when(
            F.col("__n") > 0,
            halfup_micro_div_cols_expr(F.col("__sum_mm"), n2),
        ).alias("pe_micro"),
        F.when(den != 0, halfup_micro_div_cols_expr(num, den)).alias(
            "kappa_micro"
        ),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    max_groups: int = 10_000,
) -> DataFrame:
    """Per-group Gini concentration — `gini_coefficient`'s inequality
    readout as a grouped card ("how concentrated is revenue inside
    EACH segment"). One row per group: (group, n, total, gini_micro),
    same textbook rank form and exactness contract as the global
    operator.

    The scale point: a bare `row_number() OVER (PARTITION BY group
    ORDER BY value)` serializes each group through ONE task — with few
    groups (the usual categorical case) that is the measured 9.5×
    top-k failure. Instead the within-group rank rides the sampler-free
    distributed rank over ONE combined monotone key gidx·2⁶⁰ + value
    (the low-cardinality-first-key idiom from curriculum_order): group
    index and exclusive row offsets come from the COLLAPSED group frame
    (bounded by ``max_groups``, guarded in-plan), the global rank minus
    the group's offset is exactly the within-group rank, and every
    window in the plan is bucket- or group-frame-bounded.

    In-plan guards: negative values (Gini undefined), value ≥ 2⁶⁰
    (combined-key monotonicity bound — cents to 1.15e18 pass), group
    count past ``max_groups``.
    """
    gneg = guarded(
        F.col(value_col) < 0,
        f"gini_by_group: negative {value_col!r} — Gini is defined on"
        " non-negative measures",
    )
    gbig = guarded(
        F.col(value_col).cast(D38) >= F.lit(2**60).cast(D38),
        f"gini_by_group: {value_col!r} >= 2^60 breaks the combined-key"
        " monotonicity bound; rescale the measure",
    )
    units = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        gbig(gneg(F.col(value_col).cast("long"), "long"), "long").alias("__x"),
        F.col(key_col).alias("__k"),
    )
    # collapsed group frame: bounded by the categorical cardinality,
    # guarded in-plan; its windows are group-frame-sized, never data.
    wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gmany = guarded(
        F.count(F.lit(1)).over(wa) > F.lit(max_groups),
        f"gini_by_group: more than {max_groups} groups — the group map"
        " frame is bounded in-plan; collapse the grouping upstream or"
        " raise max_groups",
    )
    groups = units.groupBy("__g").agg(
        F.count(F.lit(1)).cast(D38).alias("__gn"),
        F.sum(F.col("__x").cast(D38)).cast(D38).alias("__gsx"),
    )
    wg = Window.orderBy("__g")
    gmap = groups.select(
        gmany(F.col("__g")).alias("__g"),
        "__gn",
        "__gsx",
        (F.row_number().over(wg) - 1).cast(D38).alias("__gidx"),
        F.coalesce(
            F.sum("__gn").over(wg.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast(D38),
        ).cast(D38).alias("__goff"),
    )
    keyed = units.join(gmap.select("__g", "__gidx", "__goff"), "__g").select(
        "__g",
        "__x",
        "__k",
        "__goff",
        (
            F.col("__gidx") * F.lit(2**60).cast(D38)
            + F.col("__x").cast(D38)
        ).cast(D38).alias("__ck"),
    )
    ranked = global_ranked(keyed, ["__ck", "__k"], rank_col="__grk")
    contrib = ranked.select(
        "__g",
        (
            (F.col("__grk").cast(D38) - F.col("__goff"))
            * F.col("__x").cast(D38)
        ).cast(D38).alias("__rx"),
    )
    srx = contrib.groupBy("__g").agg(
        F.sum("__rx").cast(D38).alias("__srx")
    )
    out = srx.join(gmap, "__g")
    num = (F.lit(2).cast(D38) * F.col("__srx")
           - (F.col("__gn") + 1).cast(D38) * F.col("__gsx")).cast(D38)
    den = (F.col("__gn") * F.col("__gsx")).cast(D38)
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__gn").cast("long").alias("n"),
        F.col("__gsx").cast("long").alias("total"),
        F.when(
            F.col("__gsx") > 0, halfup_micro_div_cols_expr(num, den)
        ).alias("gini_micro"),
    )
