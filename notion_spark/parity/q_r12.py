"""Round-12 registrations: agreement statistics, marketing attribution,
growth/engagement accounting, degree assortativity, seasonality,
hapax card. Same determinism contract as everywhere else:
exact-integer accumulation, half-up micro division, pinned-IEEE
doubles only as single casts of exact integers, identical aliases on
both sides."""

from notion_spark.parity._base import *  # noqa: F401,F403
from notion_spark.parity.q_ext import _hu


@register(
    "stats_cohens_kappa_orders",
    f"""
    WITH base AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'hi' ELSE 'lo' END AS a,
               CASE WHEN o_orderstatus = 'F' THEN 'hi' ELSE 'lo' END AS b
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS HUGEINT)
                   AS agree
        FROM base
    ),
    ma AS (SELECT a, CAST(COUNT(*) AS HUGEINT) AS c FROM base GROUP BY 1),
    mb AS (SELECT b, CAST(COUNT(*) AS HUGEINT) AS c FROM base GROUP BY 1),
    mm AS (
        SELECT CAST(COALESCE(SUM(ma.c * mb.c), 0) AS HUGEINT) AS s
        FROM ma JOIN mb ON ma.a = mb.b
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS n_agree,
           CASE WHEN n > 0 THEN {_hu('agree', 'n')} END AS po_micro,
           CASE WHEN n > 0 THEN {_hu('s', 'n * n')} END AS pe_micro,
           CASE WHEN n * n - s <> 0
                THEN {_hu('(n * agree - s)', '(n * n - s)')}
           END AS kappa_micro
    FROM tot CROSS JOIN mm
    """,
)
def stats_cohens_kappa_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two derived binary raters on orders
    (urgency flag vs fulfilled flag) — `pipeline.stats.cohens_kappa`'s
    one-division algebraic form vs the oracle's margin CTEs."""
    from notion_spark.pipeline.stats import cohens_kappa

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderstatus").isNotNull()
    )
    df = o.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hi"
        ).otherwise("lo").alias("ra"),
        F.when(F.col("o_orderstatus") == "F", "hi").otherwise("lo").alias("rb"),
    )
    return cohens_kappa(df, "ra", "rb")


@register(
    "behavior_attribution",
    """
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
          AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    lt AS (
        SELECT user_id, us, event_type, cents,
               last_value(CASE WHEN event_type IN ('view', 'click')
                               THEN us END IGNORE NULLS) OVER w AS lt_us,
               last_value(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS lt_et
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    rev AS (
        SELECT CASE WHEN lt_us IS NOT NULL
                         AND us - lt_us <= 604800000000
                    THEN lt_et ELSE 'direct' END AS channel,
               COALESCE(cents, 0) AS cents
        FROM lt WHERE event_type = 'purchase'
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM rev GROUP BY channel
    """,
)
def behavior_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchase cents to view/click within a
    7-day window (`operators.behavior.attribution_last_touch`): the
    running ignorenulls-last window vs the oracle's IGNORE NULLS
    last_value over the identical (ts, tie) frame."""
    from notion_spark.operators.behavior import attribution_last_touch

    ev = read_table(spark, sf_dir, "events")
    return attribution_last_touch(ev, window_us=7 * 24 * 3_600_000_000)


@register(
    "behavior_retention_days",
    f"""
    WITH base AS (
        SELECT user_id AS u, CAST(ts AS DATE) AS d FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    wd AS (SELECT u, d, MIN(d) OVER (PARTITION BY u) AS d0 FROM base),
    pu AS (
        SELECT u, d0,
               MAX(CASE WHEN date_diff('day', d0, d) = 1
                        THEN 1 ELSE 0 END) AS f1,
               MAX(CASE WHEN date_diff('day', d0, d) BETWEEN 1 AND 7
                        THEN 1 ELSE 0 END) AS f7,
               MAX(CASE WHEN date_diff('day', d0, d) BETWEEN 1 AND 30
                        THEN 1 ELSE 0 END) AS f30
        FROM wd GROUP BY 1, 2
    ),
    coh AS (
        SELECT d0, CAST(COUNT(*) AS HUGEINT) AS n_users,
               CAST(SUM(f1) AS HUGEINT) AS n_d1,
               CAST(SUM(f7) AS HUGEINT) AS n_d7,
               CAST(SUM(f30) AS HUGEINT) AS n_d30
        FROM pu GROUP BY 1
    )
    SELECT strftime(d0, '%Y-%m-%d') AS cohort_day,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_d1 AS BIGINT) AS n_d1,
           CAST(n_d7 AS BIGINT) AS n_d7,
           CAST(n_d30 AS BIGINT) AS n_d30,
           {_hu('n_d1', 'n_users')} AS r_d1_micro,
           {_hu('n_d7', 'n_users')} AS r_d7_micro,
           {_hu('n_d30', 'n_users')} AS r_d30_micro
    FROM coh
    """,
)
def behavior_retention_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7/D30 bounded-window retention per cohort day
    (`operators.behavior.retention_days`)."""
    from notion_spark.operators.behavior import retention_days

    ev = read_table(spark, sf_dir, "events")
    out = retention_days(ev, day_offsets=(1, 7, 30))
    return out.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "n_users", "n_d1", "n_d7", "n_d30",
        "r_d1_micro", "r_d7_micro", "r_d30_micro",
    )


@register(
    "behavior_bounce_rate",
    f"""
    WITH s AS (
        SELECT user_id, ts,
               SUM(CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                        ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS seq
        FROM (
            SELECT user_id, ts, event_id,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL)
    ),
    per AS (
        SELECT user_id, seq, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(MIN(ts) AS DATE) AS day
        FROM s GROUP BY 1, 2
    ),
    byday AS (
        SELECT day, CAST(COUNT(*) AS HUGEINT) AS n_sessions,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS n_bounces
        FROM per GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_bounces AS BIGINT) AS n_bounces,
           {_hu('n_bounces', 'n_sessions')} AS bounce_micro
    FROM byday
    """,
)
def behavior_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session bounce rate over the 30-min gap sessionizer
    (`operators.behavior.bounce_rate`); the oracle re-derives the
    sessions with the events_sessionize SQL formulation."""
    from notion_spark.operators.behavior import bounce_rate

    ev = read_table(spark, sf_dir, "events")
    out = bounce_rate(ev, gap_minutes=30.0)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_sessions", "n_bounces", "bounce_micro",
    )


@register(
    "behavior_power_curve",
    """
    WITH pu AS (
        SELECT user_id, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_active_days
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1
    )
    SELECT n_active_days, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM pu GROUP BY 1
    """,
)
def behavior_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-days engagement distribution
    (`operators.behavior.power_user_curve`)."""
    from notion_spark.operators.behavior import power_user_curve

    ev = read_table(spark, sf_dir, "events")
    return power_user_curve(ev).select(
        F.col("n_active_days").cast("long").alias("n_active_days"),
        "n_users",
    )


@register(
    "behavior_growth_accounting",
    """
    WITH weeks AS (
        SELECT DISTINCT user_id AS u,
               CAST(date_trunc('week', ts) AS DATE) AS w
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    lagged AS (
        SELECT u, w,
               lag(w) OVER (PARTITION BY u ORDER BY w) AS prev,
               MIN(w) OVER (PARTITION BY u) AS fw
        FROM weeks
    ),
    active AS (
        SELECT w AS week, 1 AS act,
               CASE WHEN w = fw THEN 1 ELSE 0 END AS nw,
               CASE WHEN prev IS NOT NULL
                         AND date_diff('day', prev, w) = 7
                    THEN 1 ELSE 0 END AS ret,
               CASE WHEN w <> fw
                         AND NOT (prev IS NOT NULL
                                  AND date_diff('day', prev, w) = 7)
                    THEN 1 ELSE 0 END AS res,
               0 AS chu
        FROM lagged
    ),
    churn AS (
        SELECT w + 7 AS week, 0 AS act, 0 AS nw, 0 AS ret, 0 AS res,
               1 AS chu
        FROM (
            SELECT u, w, lead(w) OVER (PARTITION BY u ORDER BY w) AS nxt
            FROM weeks)
        WHERE nxt IS NULL OR date_diff('day', w, nxt) > 7
    ),
    un AS (SELECT * FROM active UNION ALL SELECT * FROM churn)
    SELECT strftime(week, '%Y-%m-%d') AS week,
           CAST(SUM(act) AS BIGINT) AS n_active,
           CAST(SUM(nw) AS BIGINT) AS n_new,
           CAST(SUM(ret) AS BIGINT) AS n_retained,
           CAST(SUM(res) AS BIGINT) AS n_resurrected,
           CAST(SUM(chu) AS BIGINT) AS n_churned
    FROM un GROUP BY week
    """,
)
def behavior_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly new/retained/resurrected/churned decomposition
    (`operators.behavior.growth_accounting`)."""
    from notion_spark.operators.behavior import growth_accounting

    ev = read_table(spark, sf_dir, "events")
    out = growth_accounting(ev)
    return out.select(
        F.date_format("week", "yyyy-MM-dd").alias("week"),
        "n_active", "n_new", "n_retained", "n_resurrected", "n_churned",
    )


@register(
    "graph_degree_assortativity",
    """
    WITH e AS (
        SELECT DISTINCT l_partkey AS s, l_suppkey AS d FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    ),
    ds AS (SELECT s, CAST(COUNT(*) AS HUGEINT) AS x FROM e GROUP BY 1),
    dd AS (SELECT d, CAST(COUNT(*) AS HUGEINT) AS y FROM e GROUP BY 1),
    j AS (SELECT x, y FROM e JOIN ds USING (s) JOIN dd USING (d)),
    agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy
        FROM j
    ),
    m AS (
        SELECT n, n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
        FROM agg
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
               CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
                    AS BIGINT) END AS rho_sign,
           CASE WHEN n >= 2 AND dx > 0 AND dy > 0 THEN
               (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
               / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) END AS rho2
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part→supplier edge list
    (`operators.graph.degree_assortativity`): exact LONG-product
    moments, rho² through the pinned-IEEE contract."""
    from notion_spark.operators.graph import degree_assortativity

    li = read_table(spark, sf_dir, "lineitem")
    return degree_assortativity(li, "l_partkey", "l_suppkey")


@register(
    "ts_seasonality_index",
    f"""
    WITH base AS (
        SELECT month(o_orderdate) AS month,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    pm AS (
        SELECT month, CAST(SUM(v) AS HUGEINT) AS c FROM base GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(c) AS HUGEINT) AS tot FROM pm)
    SELECT CAST(month AS BIGINT) AS month,
           CAST(c AS BIGINT) AS cents,
           CASE WHEN tot <> 0 THEN {_hu('12 * c', 'tot')} END
               AS index_micro
    FROM pm CROSS JOIN t
    """,
)
def ts_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year revenue seasonality index
    (`operators.timeseries.seasonality_index`)."""
    from notion_spark.operators.timeseries import seasonality_index

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    out = seasonality_index(o, "o_orderdate", "cents")
    return out.select(
        F.col("month").cast("long").alias("month"), "cents", "index_micro"
    )


@register(
    "text_hapax_ratio",
    f"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    v AS (SELECT tok, CAST(COUNT(*) AS HUGEINT) AS c FROM toks GROUP BY 1),
    agg AS (
        SELECT CAST(SUM(c) AS HUGEINT) AS n_tokens,
               CAST(COUNT(*) AS HUGEINT) AS n_vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS n_hapax
        FROM v
    )
    SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_vocab AS BIGINT) AS n_vocab,
           CAST(n_hapax AS BIGINT) AS n_hapax,
           CASE WHEN n_vocab > 0 THEN {_hu('n_hapax', 'n_vocab')} END
               AS hapax_micro
    FROM agg
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena corpus card
    (`pipeline.text_analysis.hapax_stats`)."""
    from notion_spark.pipeline.text_analysis import hapax_stats

    docs = read_table(spark, sf_dir, "documents")
    return hapax_stats(docs)


@register(
    "text_dup_ngrams",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    grams AS (
        SELECT doc_id, unnest(
            [array_to_string(t[i:i+7], ' ')
             for i in generate_series(1, greatest(len(t) - 7, 0))]
        ) AS g
        FROM toks
    ),
    per AS (
        SELECT doc_id, g, CAST(COUNT(*) AS HUGEINT) AS c
        FROM grams GROUP BY 1, 2
    ),
    agg AS (
        SELECT CAST(COALESCE(SUM(c), 0) AS HUGEINT) AS n_grams,
               CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END), 0)
                    AS HUGEINT) AS n_dup
        FROM per
    ),
    d AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs FROM toks)
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_dup AS BIGINT) AS n_dup_grams,
           CASE WHEN n_grams > 0 THEN {_hu('n_dup', 'n_grams')} END
               AS dup_micro
    FROM agg CROSS JOIN d
    """,
)
def text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate 8-gram share
    (`pipeline.text_analysis.dup_ngram_stats`): the Spark side builds
    grams with a slice HOF, the oracle with a list comprehension —
    structurally independent derivations of the same card."""
    from notion_spark.pipeline.text_analysis import dup_ngram_stats

    docs = read_table(spark, sf_dir, "documents")
    return dup_ngram_stats(docs, n=8)


@register(
    "text_oov_rate",
    f"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT tok, CAST(COUNT(*) AS HUGEINT) AS c FROM toks GROUP BY 1
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn
        FROM counts
    ),
    agg AS (
        SELECT CAST(COALESCE(SUM(c), 0) AS HUGEINT) AS n_total,
               CAST(COALESCE(SUM(CASE WHEN rn <= 1000 THEN c ELSE 0 END), 0)
                    AS HUGEINT) AS n_covered
        FROM ranked
    )
    SELECT CAST(1000 AS BIGINT) AS vocab_k,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(n_covered AS BIGINT) AS n_covered,
           CASE WHEN n_total > 0
                THEN {_hu('(n_total - n_covered)', 'n_total')} END
               AS oov_micro
    FROM agg
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1000-vocabulary coverage / OOV share
    (`pipeline.text_analysis.oov_rate`); deterministic top-k under
    (count desc, token asc)."""
    from notion_spark.pipeline.text_analysis import oov_rate

    docs = read_table(spark, sf_dir, "documents")
    return oov_rate(docs, vocab_k=1_000)


@register(
    "behavior_arpu",
    f"""
    WITH base AS (
        SELECT user_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE user_id IS NOT NULL
    ),
    agg AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN COALESCE(cents, 0) END), 0)
                    AS HUGEINT) AS rev,
               CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS nu,
               CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                        THEN user_id END) AS HUGEINT) AS np
        FROM base
    )
    SELECT CAST(rev AS BIGINT) AS revenue_cents,
           CAST(nu AS BIGINT) AS n_users,
           CAST(np AS BIGINT) AS n_payers,
           CASE WHEN nu > 0 THEN {_hu('rev', 'nu')} END AS arpu_micro_cents,
           CASE WHEN np > 0 THEN {_hu('rev', 'np')} END AS arppu_micro_cents,
           CASE WHEN nu > 0 THEN {_hu('np', 'nu')} END AS payer_share_micro
    FROM agg
    """,
)
def behavior_arpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARPU/ARPPU/payer-share monetization card
    (`operators.behavior.arpu_card`)."""
    from notion_spark.operators.behavior import arpu_card

    ev = read_table(spark, sf_dir, "events")
    return arpu_card(ev)


@register(
    "profile_gini_by_group",
    f"""
    WITH u AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS x,
               l_orderkey * 10 + l_linenumber AS k
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    r AS (
        SELECT g, x,
               row_number() OVER (PARTITION BY g ORDER BY x, k) AS rn
        FROM u
    ),
    a AS (
        SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(rn AS HUGEINT) * CAST(x AS HUGEINT))
                    AS HUGEINT) AS srx
        FROM r GROUP BY 1
    )
    SELECT g AS l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(sx AS BIGINT) AS total,
           CASE WHEN sx > 0
                THEN {_hu('(2 * srx - (n + 1) * sx)', '(n * sx)')} END
               AS gini_micro
    FROM a
    """,
)
def profile_gini_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag revenue Gini (`pipeline.stats.gini_by_group`):
    within-group ranks from ONE sampler-free distributed rank over the
    combined gidx·2⁶⁰+value key minus broadcast group offsets — never
    a per-group single-task window; the oracle ranks with flat
    partitioned windows."""
    from notion_spark.pipeline.stats import gini_by_group

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
    ).filter(F.col("l_returnflag").isNotNull() & F.col("cents").isNotNull())
    return gini_by_group(li, "l_returnflag", "cents", "k")


@register(
    "agg_grouping_sets_revenue",
    """
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                AS BIGINT) AS cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
)
def agg_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((region), (nation), ()) revenue — the
    OLAP shape rollup/cube can't express (disjoint axes + grand total
    in ONE Expand, no union of scans). Spark side runs the SQL form
    over temp views; grouping_id disambiguates aggregate NULLs from
    data NULLs, exact cents throughout."""
    for t in ("orders", "customer", "nation", "region"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"__gs_{t}")
    return spark.sql(
        """
        SELECT r_name, n_name,
               CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT)
                   AS gid,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS cents
        FROM __gs_orders
        JOIN __gs_customer ON o_custkey = c_custkey
        JOIN __gs_nation   ON c_nationkey = n_nationkey
        JOIN __gs_region   ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


@register(
    "ts_burstiness_index",
    f"""
    WITH days AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS HUGEINT) AS x
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(MAX(x) AS HUGEINT) AS mx
        FROM days
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(sx AS BIGINT) AS n_events,
           CASE WHEN sx > 0
                THEN {_hu('(n * sxx - sx * sx)', '(n * sx)')} END
               AS fano_micro,
           CASE WHEN sx > 0 THEN {_hu('(n * mx)', 'sx')} END AS peak_micro
    FROM agg
    """,
)
def ts_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count Fano factor + peak-to-mean card
    (`operators.timeseries.burstiness_index`)."""
    from notion_spark.operators.timeseries import burstiness_index

    ev = read_table(spark, sf_dir, "events")
    return burstiness_index(ev, "ts")


@register(
    "dedup_rate_card",
    f"""
    WITH base AS (
        SELECT md5(text) AS h FROM documents WHERE text IS NOT NULL
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS nd,
               CAST(COUNT(DISTINCT h) AS HUGEINT) AS nu
        FROM base
    )
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CAST(nu AS BIGINT) AS n_unique,
           CAST(nd - nu AS BIGINT) AS n_dups,
           CASE WHEN nd > 0 THEN {_hu('(nd - nu)', 'nd')} END AS dup_micro
    FROM agg
    """,
)
def dedup_rate_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate card (`pipeline.dedup.dedup_rate_card`)."""
    from notion_spark.pipeline.dedup import dedup_rate_card as card

    docs = read_table(spark, sf_dir, "documents")
    return card(docs)
