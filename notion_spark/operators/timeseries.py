"""Time-series densification and exact per-group trend fitting.

`resample_fill` turns an irregular event stream into a dense per-period
series per key — the gap-filling step before any rolling metric, chart,
or model feature over time (the reference's weekly velocity implicitly
relies on pandas resample emitting empty weeks; Spark's groupBy simply
has no row to emit, so the periods must be generated).

`groupwise_linfit` fits y = a + b·x per group in closed form from four
sums (Σx, Σy, Σxy, Σx²) — the metric-trend detector ("is this source's
quality drifting?"). Like operators/anomaly, all moments are exact
integers in micro-units, so slope numerator/denominator are
bit-reproducible on any engine and under any partitioning; the float
slope is derived by ONE division at the end.

Scale shape:
- resample_fill: per-key min/max reduce to |keys| rows; `sequence()`
  explodes periods JVM-side (no Python, no driver loop); the left join
  back to period aggregates is keyed on (key, period) — one shuffle
  each side, both already aggregated. Guard: periods-per-key is bounded
  by the data's own time span; a corrupt far-future timestamp would
  explode the sequence, so spans are capped (`max_periods`).
- groupwise_linfit: one map-side-combined groupBy to |groups| rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_spark.functions.exactmath import D38, guarded, micro_units


def resample_fill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    period: str = "1 day",
    max_periods: int = 100_000,
) -> DataFrame:
    """Dense per-``period`` series per ``key`` between each key's own
    first and last event: (key, period_start, n_events, sum_value,
    filled sum carried LOCF on empty periods, is_gap flag).

    Sums route through DECIMAL(18,2); period starts are date_trunc'd to
    the period unit. Keys whose span would exceed ``max_periods``
    periods raise — a single bad timestamp must not OOM the explode.

    Rows with a NULL timestamp are dropped (they belong to no period);
    a key whose rows are ALL null-timestamped vanishes entirely. Gate
    with `pipeline.expectations.expect_not_null` upstream if null
    timestamps should be an error rather than an exclusion."""
    # Validate the FULL format up front: a bare unit ('day') or a
    # non-numeric count ('x day') would pass a unit-only check and then
    # die later inside F.expr(f"interval {period}") with an opaque
    # parse error. Normalize a bare unit to '1 <unit>'.
    parts = period.split()
    if len(parts) == 1:
        parts = ["1", parts[0]]
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(
            f"unsupported period {period!r}: expected '1 <unit>' with "
            "unit in hour/day/week/month"
        )
    unit = parts[-1].rstrip("s")
    if unit not in ("day", "week", "hour", "month"):
        raise ValueError(f"unsupported period {period!r}")
    # Multi-unit periods ('2 days', '12 hours') would bucket events on
    # the single-unit date_trunc grid while the dense calendar steps by
    # the full interval — the off-grid buckets would never join and
    # their events would silently vanish. Only unit periods are
    # expressible with date_trunc; reject the rest loudly.
    if parts[0] != "1":
        raise ValueError(
            f"unsupported period {period!r}: only single-unit periods "
            "('1 hour'/'1 day'/'1 week'/'1 month') align with the "
            "date_trunc bucket grid"
        )
    period = f"1 {unit}"

    truncated = df.filter(F.col(ts).isNotNull()).select(
        F.col(key).alias("k"),
        F.date_trunc(unit, F.col(ts)).alias("p"),
        F.col(value).alias("v"),
    )
    per_period = truncated.groupBy("k", "p").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_value"),
    )
    spans = truncated.groupBy("k").agg(
        F.min("p").alias("lo"), F.max("p").alias("hi")
    )
    # bound the explode BEFORE it happens; the guard is folded into the
    # sequence's own lower bound so column pruning cannot drop it
    n_hours = F.timestamp_diff("HOUR", F.col("lo"), F.col("hi"))
    too_big = n_hours > F.lit(max_periods) * F.lit(
        {"hour": 1, "day": 24, "week": 168, "month": 744}[unit]
    )
    guarded_lo = guarded(
        too_big,
        F.concat(
            F.lit("resample_fill: key span exceeds max_periods: "),
            F.col("k").cast("string"),
        ),
    )(F.col("lo"), "timestamp")
    dense = spans.select(
        "k",
        F.explode(
            F.sequence(guarded_lo, F.col("hi"), F.expr(f"interval {period}"))
        ).alias("p"),
    )
    joined = dense.join(per_period, on=["k", "p"], how="left")
    # a gap is a period with NO rows — not a period whose values were
    # all NULL (n_events is the presence marker, sum_value is not)
    w = F.col("n_events").isNull()
    from pyspark.sql.window import Window

    locf = Window.partitionBy("k").orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        F.col("k").alias(key),
        F.col("p").alias("period_start"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(locf).alias("filled_value"),
        w.alias("is_gap"),
    )


def groupwise_linfit(
    df: DataFrame,
    group_cols: str | list[str],
    x_col: str,
    y_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """Closed-form least-squares y = a + b·x per group, from exact
    integer moments: emits (groups..., n, slope_num, slope_den —
    exact DECIMAL(38,0) integers with slope = slope_num/slope_den —
    and `slope` as the one-division double). Groups with n < 2 or a
    constant x (slope_den = 0) emit NULL slope.

    slope_num = n·Σxy − Σx·Σy,  slope_den = n·Σx² − (Σx)²  — both in
    micro-unit² scale, which CANCELS in the ratio, so `slope` is in
    natural y-per-x units."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    mx = micro_units(x_col, micro)
    my = micro_units(y_col, micro)
    base = df.select(*groups, mx.alias("__x"), my.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    agg = base.groupBy(*groups).agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum("__x").cast(D38).alias("sx"),
        F.sum("__y").cast(D38).alias("sy"),
        F.sum((F.col("__x") * F.col("__y")).cast(D38)).cast(D38).alias("sxy"),
        F.sum((F.col("__x") * F.col("__x")).cast(D38)).cast(D38).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(D38)
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(D38)
    # Same loud overflow guard as operators/anomaly: with ANSI off a
    # DECIMAL(38,0) product past 10^38 NULLs silently — the trend
    # monitor would report "no slope" for exactly the largest groups.
    # Double estimates (cannot overflow) with a 100x margin.
    n_d, sx_d, sy_d, sxy_d, sxx_d = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx")
    )
    est = F.greatest(
        F.abs(n_d * sxy_d), F.abs(sx_d * sy_d), F.abs(n_d * sxx_d), sx_d * sx_d
    )
    _guard = guarded(
        est > F.lit(1e36),
        "groupwise_linfit: integer moments would exceed DECIMAL(38,0) — reduce `micro`",
    )

    return agg.select(
        *groups,
        _guard(F.col("n"), "bigint").alias("n"),
        _guard(num, D38).alias("slope_num"),
        _guard(den, D38).alias("slope_den"),
        _guard(
            F.when(
                (F.col("n") >= 2) & (den != 0),
                num.cast("double") / den.cast("double"),
            ),
            "double",
        ).alias("slope"),
    )


def autocorrelation(
    df: DataFrame,
    value_col: str,
    series_col: str,
    order_cols: Sequence[str] = ("ts", "event_id"),
    lags: Sequence[int] = (1, 2, 3),
    value_scale: int = 100,
) -> DataFrame:
    """Pooled within-series lag-k autocorrelation — the temporal-
    dependence profile ("is this metric memoryless, or do values
    persist?") that decides whether a stream needs decorrelation
    before sampling or drift tests. For each lag k, every series
    contributes its (x_t, x_{t+k}) pairs — pairs NEVER span series —
    and one pooled Pearson structure is computed per lag over exact
    integer moments. Output: (lag, n_pairs, r_sign, r2), one row per
    requested lag.

    Same engine-exact contract as `profile.numeric_correlations`: the
    only aggregation is integer sums (LONG products per pair under an
    in-plan |x| ≤ 1e7 fixed-point guard, decimal-widened sums), and
    cov/r² derive through single identical IEEE casts+divides — no
    engine corr(), no accumulation-order drift. ``value_scale`` is the
    fixed-point multiplier (default 100: cents for 2-decimal values).

    Pooling within series is also the SCALE design: a global series
    would need one total-order window (single-task sort at 100 TB);
    per-series windows are bounded (sessions, users, devices), the
    lag leads ride ONE window, and everything after is a map-side-
    combined aggregate to |lags| rows."""
    from notion_spark.functions.exactmath import D38, guarded

    lags = list(lags)
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lags must be >= 1, got {lags!r}")
    d20 = "decimal(20,0)"
    x = (F.col(value_col).cast("decimal(18,2)") * value_scale).cast("long")
    w = Window.partitionBy(series_col).orderBy(*[F.col(c).asc() for c in order_cols])
    staged = df.filter(F.col(value_col).isNotNull()).withColumn("__x", x)
    for k in lags:
        staged = staged.withColumn(f"__y{k}", F.lead("__x", k).over(w))
    pairs = staged.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("lag"), F.col("__x").alias("x"),
                         F.col(f"__y{k}").alias("y"))
                for k in lags
            ])
        ).alias("p")
    ).select("p.*").filter(F.col("y").isNotNull())
    _rg = guarded(
        F.greatest(F.abs(F.col("x")), F.abs(F.col("y"))) > F.lit(10_000_000),
        "autocorrelation: |fixed-point value| > 1e7 — per-pair products"
        " would outgrow exact LONG arithmetic; lower value_scale",
    )
    gx, gy = _rg(F.col("x"), "long"), _rg(F.col("y"), "long")
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum(gx.cast(d20)).cast(D38).alias("sx"),
        F.sum(gy.cast(d20)).cast(D38).alias("sy"),
        F.sum((gx * F.col("y")).cast(d20)).cast(D38).alias("sxy"),
        F.sum((gx * F.col("x")).cast(d20)).cast(D38).alias("sxx"),
        F.sum((gy * F.col("y")).cast(d20)).cast(D38).alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast(D38)
    den_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast(D38)
    den_y = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast(D38)
    num_d, dx_d, dy_d = num.cast("double"), den_x.cast("double"), den_y.cast("double")
    n_d = n.cast("double")
    _og = guarded(
        F.greatest(
            F.abs(n_d * F.col("sxx").cast("double")),
            F.abs(n_d * F.col("syy").cast("double")),
            F.abs(n_d * F.col("sxy").cast("double")),
        ) > F.lit(1e37),
        "autocorrelation: moment products exceed DECIMAL(38,0) — lower"
        " value_scale or profile a sample",
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        _og(n, "long").alias("n_pairs"),
        _og(F.signum(num_d), "int").alias("r_sign"),
        _og(
            F.when((den_x > 0) & (den_y > 0), (num_d * num_d) / (dx_d * dy_d)),
            "double",
        ).alias("r2"),
    )


def dow_profile(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Day-of-week seasonality profile per series — the load-shape
    audit (is traffic weekday-heavy? does one event type spike on
    Sundays?). One row per (series, dow 0..6) INCLUDING zero days, so
    every series is a complete 7-row shape: (series, dow, n,
    share_ppm, deviation_ppm) where share is the half-up micro
    fraction of the series total and deviation subtracts the exact
    uniform expectation halfup(1/7) = 142857 ppm.

    The day-of-week is pinned arithmetically — ((days_since_epoch + 4)
    mod 7, 0 = Sunday; 1970-01-01 was a Thursday) — never an engine
    dayofweek() whose 0/1-base and week-start conventions differ
    between engines. Scale shape: one map-side-combined groupBy over
    <= 7*|series| keys, a |series|-row total frame joined broadcast,
    and a literal 7-row grid for the zero days.
    """
    from notion_spark.functions.exactmath import halfup_micro_div_cols

    # pmod, not %: Spark's % keeps the dividend sign, so pre-1970
    # timestamps (negative days_since_epoch) would produce dows in
    # -6..-1 that never match the 0..6 grid — counted in the series
    # total yet silently absent from the 7-row shape (ADVICE r10).
    base = df.filter(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull()).select(
        F.col(type_col).alias("series"),
        F.pmod(
            F.datediff(
                F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
            )
            + 4,
            F.lit(7),
        )
        .cast("int")
        .alias("dow"),
    )
    counts = base.groupBy("series", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = base.groupBy("series").agg(F.count(F.lit(1)).cast("long").alias("__tot"))
    spark = df.sparkSession
    dows = spark.range(7).select(F.col("id").cast("int").alias("dow"))
    grid = (
        totals.crossJoin(F.broadcast(dows))
        .join(F.broadcast(counts), ["series", "dow"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0).cast("long")))
    )
    uniform = 142_857  # halfup_micro(1, 7), pinned
    return grid.select(
        "series",
        "dow",
        "n",
        halfup_micro_div_cols("n", "__tot").alias("share_ppm"),
        (halfup_micro_div_cols("n", "__tot") - F.lit(uniform))
        .cast("long")
        .alias("deviation_ppm"),
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
) -> DataFrame:
    """CUSUM change-point detection over daily counts per series — did
    this event stream's level SHIFT, and when? One row per series:
    (series, n_days, total, changepoint_day, cusum_micro) where the
    classic cumulative-sum statistic S_t = Σ_{i≤t}(x_i - mean) is
    carried EXACTLY as T_t = n*cum_t - t*total (the n-scaled form —
    no float mean ever exists), the change-point is the day with max
    |T_t| (smallest day under ties, max_by over a (|T|, -day)
    struct), and cusum_micro = halfup(max|T|, n*total) normalizes to
    [0, 1e6] (0 = flat, large = a level shift splits the window
    there). Days are integer days-since-epoch (the pinned date
    arithmetic, no engine dow/week). Series with total = 0 yield NULL.

    Scale shape: the data collapses to the (series, day) count frame
    (map-side combined) — per-series windows then run over calendar
    days, bounded by the observation span (a 3-year daily panel is
    ~1.1k rows per series), never by the event count. Headroom:
    n*cum ≤ days*N ≤ far inside DECIMAL(38,0).
    """
    from notion_spark.functions.exactmath import D38
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(series_col).isNotNull())
        .select(
            F.col(series_col).alias("series"),
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("__d"),
        )
        .groupBy("series", "__d")
        .agg(F.count(F.lit(1)).cast(D38).alias("__x"))
    )
    w = Window.partitionBy("series").orderBy(F.asc("__d"))
    wall = Window.partitionBy("series").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = daily.select(
        "series",
        "__d",
        F.sum("__x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__cum"),
        F.row_number().over(w).cast("long").alias("__t"),
        F.count(F.lit(1)).over(wall).cast(D38).alias("__n"),
        F.sum("__x").over(wall).cast(D38).alias("__tot"),
    ).withColumn(
        "__T",
        (F.col("__n") * F.col("__cum") - F.col("__t") * F.col("__tot")).cast(D38),
    )
    agg = staged.groupBy("series").agg(
        F.max("__n").cast("long").alias("n_days"),
        F.max("__tot").cast("long").alias("total"),
        F.max(F.abs(F.col("__T"))).cast(D38).alias("__tmax"),
        F.expr(
            "max_by(__d, named_struct('t', CAST(abs(__T) AS DECIMAL(38,0)),"
            " 'negd', -__d))"
        ).alias("changepoint_day"),
    )
    return agg.select(
        "series",
        "n_days",
        "total",
        F.col("changepoint_day").cast("long").alias("changepoint_day"),
        F.when(
            F.col("total") > 0,
            halfup_micro_div_cols_expr(
                F.col("__tmax"),
                (F.col("n_days").cast(D38) * F.col("total").cast(D38)).cast(D38),
            ),
        ).alias("cusum_micro"),
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    series_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average per series — the step-function integral
    (TWAP / average balance / average position): each observation
    holds until the next one, so the mean weights every value by HOW
    LONG it held, not how often it was sampled. One row per series
    with ≥ 2 observations:

        (series, n_obs, span_us, twa_micro)

    where twa_micro = Σ value_i·(t_{i+1} − t_i) / span in half-up
    micro-units — entirely exact integers (microsecond timestamps ×
    fixed-point values in DECIMAL(38,0); the last observation carries
    no weight, the standard left-step convention). Values must be
    integer fixed-point (|v| ≤ 1e12 keeps v·span_us inside
    DECIMAL(38,0) for century spans — in-plan guard).

    Scale shape: one per-series lead() window (bounded by a series'
    events, never global) and one map-side-combined reduce."""
    from notion_spark.functions.exactmath import D38, guarded
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    gmag = guarded(
        F.abs(F.col(value_col)) > F.lit(1_000_000_000_000),
        f"time_weighted_avg: |{value_col}| > 1e12 — value*span_us would"
        " leave DECIMAL(38,0); rescale the fixed-point input",
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).cast("long")
    w = Window.partitionBy(series_col).orderBy(F.asc(ts_col), F.asc(tie_col))
    staged = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(series_col).alias("series"),
            gmag(F.col(value_col).cast("long"), "long").alias("__v"),
            us.alias("__us"),
            F.col(tie_col).alias("__tie"),
        )
        .withColumn(
            "__hold",
            F.lead(F.col("__us")).over(
                Window.partitionBy("series").orderBy(F.asc("__us"), F.asc("__tie"))
            )
            - F.col("__us"),
        )
    )
    agg = staged.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("__hold").cast(D38).alias("__span"),
        F.sum(
            (F.col("__v").cast(D38) * F.col("__hold").cast(D38)).cast(D38)
        )
        .cast(D38)
        .alias("__area"),
    )
    return agg.filter(F.col("__span") > 0).select(
        "series",
        "n_obs",
        F.col("__span").cast("long").alias("span_us"),
        halfup_micro_div_cols_expr(F.col("__area"), F.col("__span")).alias(
            "twa_micro"
        ),
    )


def gap_report(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    threshold_us: int = 86_400_000_000,
) -> DataFrame:
    """Outage / silence audit per series: the inter-event gap profile
    that answers "did this feed stall, and for how long". One row per
    series: (series, n_events, span_us, max_gap_us, n_gaps_over,
    mean_gap_micro_us).

    All exact integers: gaps are epoch-microsecond differences under
    the (ts, tie_col) per-series total order (the tiebreak makes
    equal-timestamp runs contribute exact zero-gaps deterministically);
    mean gap is one half-up micro division of span by (n−1) — and
    span/(n−1) ≡ mean of gaps exactly, so no gap summation is even
    needed. ``threshold_us`` counts gaps strictly over it (default one
    day). Single-event series emit NULL max/mean.

    Scale shape: one series-keyed shuffle for the lag window (the only
    per-row op), then a map-side-combined groupBy to the |series|
    frame. A single hot series serializes through one task's window —
    inherent to an ordered per-series scan; shard upstream if one
    series is the corpus.
    """
    from notion_spark.functions.exactmath import D38
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    base = df.filter(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("series"),
        # NTZ -> TZ cast is an identity on the instant under the UTC
        # session timezone (unix_micros rejects TIMESTAMP_NTZ)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(tie_col).alias("__tie"),
    )
    w = Window.partitionBy("series").orderBy(F.asc("__us"), F.asc("__tie"))
    gapped = base.withColumn(
        "__gap", F.col("__us") - F.lag("__us").over(w)
    )
    agg = gapped.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("__us") - F.min("__us")).cast("long").alias("span_us"),
        F.max("__gap").cast("long").alias("max_gap_us"),
        F.count(F.when(F.col("__gap") > threshold_us, F.lit(1)))
        .cast("long")
        .alias("n_gaps_over"),
    )
    return agg.select(
        "series",
        "n_events",
        "span_us",
        "max_gap_us",
        "n_gaps_over",
        F.when(
            F.col("n_events") >= 2,
            halfup_micro_div_cols_expr(
                F.col("span_us").cast(D38),
                (F.col("n_events") - 1).cast(D38),
            ),
        ).alias("mean_gap_micro_us"),
    )


# Pinned EWMA weight table: round(1e6 * 0.25 * 0.75^i) for i = 0..7 —
# literal micro integers, identical in the DuckDB mirror, so the
# weighted sum is exact on both engines (a float alpha recurrence
# would drift per engine/order).
EWMA_WEIGHTS_MICRO = (250000, 187500, 140625, 105469, 79102, 59326, 44495, 33371)


def ewma_daily(
    df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponentially-weighted daily event volume per series — the
    smoothed load curve an alerting threshold rides. EWMA is a float
    recurrence in every textbook; here the 8-term tail is PINNED as
    literal micro-integer weights (alpha 0.25, see
    ``EWMA_WEIGHTS_MICRO``), so the smoothed value is one exact
    integer dot product per day plus one half-up division by the
    (constant) weight mass — bit-identical anywhere, and truncating
    the tail at 8 terms discards < 10% of the mass, renormalized away
    by the division.

    Output: one row per (series, day) from the 8th day of each series
    onward (full-window days only — partial windows would mix
    renormalization regimes): (series, day, n, ewma_micro). Days with
    no events count 0 via the dense per-series day grid.

    Scale shape: one map-side-combined groupBy to the (series, day)
    frame, the dense grid via `sequence()` explode over the bounded
    |series| span frame, and the 8 lags as ONE window per series over
    the bounded days×series frame — never over raw events.
    """
    from notion_spark.functions.exactmath import D38
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    base = df.filter(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("series"),
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
        ).alias("__d"),
    )
    daily = base.groupBy("series", "__d").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spans = base.groupBy("series").agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    dense = spans.select(
        "series",
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__d"),
    )
    grid = dense.join(daily, ["series", "__d"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0).cast("long"))
    )
    w = Window.partitionBy("series").orderBy(F.asc("__d"))
    terms = [
        F.lag(F.col("n"), i).over(w) * F.lit(int(wt)).cast("long")
        for i, wt in enumerate(EWMA_WEIGHTS_MICRO)
    ]
    num = terms[0]
    for t in terms[1:]:
        num = num + t
    mass = sum(EWMA_WEIGHTS_MICRO)
    out = grid.withColumn("__num", num)
    return (
        out.filter(F.col("__num").isNotNull())  # full 8-day window only
        .select(
            "series",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("__d")),
                "yyyy-MM-dd",
            ).alias("day"),
            "n",
            halfup_micro_div_cols_expr(
                F.col("__num").cast(D38), F.lit(mass).cast(D38)
            ).alias("ewma_micro"),
        )
    )


def cross_correlation(
    df: DataFrame,
    series_a: str,
    series_b: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lags: Sequence[int] = (0, 1, 2, 3),
) -> DataFrame:
    """Lagged cross-correlation structure between two named series'
    daily volumes — "do purchases follow views by k days": Pearson of
    (a_t, b_{t+k}) over the corpus's dense zero-filled day grid, one
    row per lag: (lag, n_days, r_sign, r2). autocorrelation asks the
    question of a series against itself; this asks it across two.

    Exactness: daily counts are exact LONGs on a shared dense grid
    (both series zero-filled over the FULL corpus span, so the pair
    universe is deterministic); moments are LONG products widened to
    decimal at the SUM (the numeric_correlations idiom, exact while
    daily counts stay ≤ ~3e9); r_sign/r² follow the identical-IEEE-ops
    contract — sign plus square, never the sqrt.

    Scale shape: one map-side groupBy to the (series, day) frame, the
    dense grid from a broadcast 1-row span frame, per-lag self-joins
    of the two BOUNDED |days| vectors (day-keyed, broadcastable), one
    moment aggregate per lag unioned — nothing data-sized after the
    first aggregate.
    """
    lags = list(lags)
    if not lags or any(k < 0 for k in lags):
        raise ValueError(f"cross_correlation: lags must be >= 0, got {lags}")
    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(type_col).isin([series_a, series_b])
    ).select(
        F.col(type_col).alias("__s"),
        F.datediff(
            F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
        ).alias("__d"),
    )
    daily = base.groupBy("__s", "__d").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    span = base.agg(F.min("__d").alias("__lo"), F.max("__d").alias("__hi"))
    days = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__d")
    )

    def grid_of(name: str, out: str) -> DataFrame:
        side = daily.filter(F.col("__s") == name).select("__d", "__n")
        return days.join(side, "__d", "left").select(
            "__d", F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias(out)
        )

    ga, gb = grid_of(series_a, "__a"), grid_of(series_b, "__b2")
    d20 = "decimal(20,0)"
    outs = []
    for k in lags:
        pairs = ga.join(
            gb.select((F.col("__d") - k).alias("__d"), "__b2"), "__d"
        )
        agg = pairs.agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
            F.sum(F.col("__a").cast(d20)).cast("decimal(38,0)").alias("__sx"),
            F.sum(F.col("__b2").cast(d20)).cast("decimal(38,0)").alias("__sy"),
            F.sum((F.col("__a") * F.col("__a")).cast(d20))
            .cast("decimal(38,0)")
            .alias("__sxx"),
            F.sum((F.col("__b2") * F.col("__b2")).cast(d20))
            .cast("decimal(38,0)")
            .alias("__syy"),
            F.sum((F.col("__a") * F.col("__b2")).cast(d20))
            .cast("decimal(38,0)")
            .alias("__sxy"),
        )
        n_ = F.col("__n")
        num = (n_ * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        dx = (n_ * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        dy = (n_ * F.col("__syy") - F.col("__sy") * F.col("__sy"))
        num_d = num.cast("double")
        ok = (n_ >= 2) & (dx > 0) & (dy > 0)
        outs.append(
            agg.select(
                F.lit(k).cast("long").alias("lag"),
                n_.cast("long").alias("n_days"),
                F.when(ok, F.signum(num_d).cast("long")).alias("r_sign"),
                F.when(
                    ok, (num_d * num_d) / (dx.cast("double") * dy.cast("double"))
                ).alias("r2"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def seasonality_index(
    df: DataFrame,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Month-of-year seasonality index of an exact integer measure:
    each calendar month's share of the total, scaled so a perfectly
    uniform year reads 1e6 per month — index_micro = 12·total_m /
    total as ONE half-up micro division of DECIMAL(38,0) sums. One
    row per observed month number: (month, cents, index_micro). The
    demand-planning readout ("December runs 1.4× baseline") that the
    dow_profile gives at day grain.

    Scale shape: one 12-ary map-side aggregate + a broadcast 1-row
    total — no window, no join wider than 12 rows.
    """
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.month(F.col(ts_col).cast("timestamp")).alias("month"),
        F.col(value_col).cast("long").alias("__v"),
    )
    per_m = base.groupBy("month").agg(
        F.sum(F.col("__v").cast(D38)).cast(D38).alias("__c")
    )
    tot = per_m.agg(F.sum("__c").cast(D38).alias("__tot"))
    return (
        per_m.crossJoin(F.broadcast(tot))
        .select(
            "month",
            F.col("__c").cast("long").alias("cents"),
            F.when(
                F.col("__tot") != 0,
                halfup_micro_div_cols_expr(
                    (F.lit(12).cast(D38) * F.col("__c")).cast(D38),
                    F.col("__tot"),
                ),
            ).alias("index_micro"),
        )
    )


def burstiness_index(
    df: DataFrame,
    ts_col: str,
) -> DataFrame:
    """Traffic burstiness card over the observed daily counts: the
    Fano factor (variance-to-mean ratio — 1e6 for a Poisson-like
    process, higher = bursty) and the peak-to-mean ratio, both as ONE
    exact half-up micro division each:

        (n_days, n_events, fano_micro, peak_micro)

    with fano = (n·Σx² − (Σx)²) / (n·Σx) and peak = n·max(x) / Σx
    over the per-observed-day counts x. The capacity-planning readout
    ("p99 day is 3.2× mean") a feed ingester sizes against.

    Scale shape: one day-keyed map-side count (bounded by the
    observation range), one reduce over the bounded day frame.
    """
    from notion_spark.pipeline.stats import halfup_micro_div_cols_expr

    days = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col).cast("timestamp")).alias("__d"))
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
    )
    agg = days.agg(
        F.count(F.lit(1)).cast(D38).alias("__n"),
        F.sum(F.col("__x").cast(D38)).cast(D38).alias("__sx"),
        F.sum((F.col("__x") * F.col("__x")).cast(D38)).cast(D38).alias("__sxx"),
        F.max("__x").cast(D38).alias("__mx"),
    )
    fano_num = (F.col("__n") * F.col("__sxx")
                - F.col("__sx") * F.col("__sx")).cast(D38)
    den = (F.col("__n") * F.col("__sx")).cast(D38)
    return agg.select(
        F.col("__n").cast("long").alias("n_days"),
        F.col("__sx").cast("long").alias("n_events"),
        F.when(
            F.col("__sx") > 0, halfup_micro_div_cols_expr(fano_num, den)
        ).alias("fano_micro"),
        F.when(
            F.col("__sx") > 0,
            halfup_micro_div_cols_expr(
                (F.col("__n") * F.col("__mx")).cast(D38), F.col("__sx")
            ),
        ).alias("peak_micro"),
    )
