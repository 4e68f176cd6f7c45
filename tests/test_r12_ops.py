"""Hand-computed unit cases for the r12 operator batch: Cohen's kappa,
last-touch attribution, D1/D7/D30 retention, bounce rate, power-user
curve, growth accounting, degree assortativity, seasonality index,
hapax card."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


class TestCohensKappa:
    def test_textbook_2x2(self, spark):
        from notion_spark.pipeline.stats import cohens_kappa

        rows = (
            [("Y", "Y")] * 20 + [("Y", "N")] * 5
            + [("N", "Y")] * 10 + [("N", "N")] * 15
        )
        df = spark.createDataFrame(rows, "a string, b string")
        out = cohens_kappa(df, "a", "b").collect()[0]
        # n=50 agree=35 po=.7; ma=(25,25) mb=(30,20) pe=.5; kappa=.4
        assert out.n == 50 and out.n_agree == 35
        assert out.po_micro == 700_000
        assert out.pe_micro == 500_000
        assert out.kappa_micro == 400_000

    def test_constant_raters_null(self, spark):
        from notion_spark.pipeline.stats import cohens_kappa

        df = spark.createDataFrame([("Y", "Y")] * 4, "a string, b string")
        out = cohens_kappa(df, "a", "b").collect()[0]
        assert out.kappa_micro is None  # pe == 1: undefined

    def test_nulls_listwise(self, spark):
        from notion_spark.pipeline.stats import cohens_kappa

        df = spark.createDataFrame(
            [("Y", "Y"), ("Y", None), (None, "N"), ("N", "N")],
            "a string, b string",
        )
        out = cohens_kappa(df, "a", "b").collect()[0]
        assert out.n == 2 and out.n_agree == 2


class TestAttributionLastTouch:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double",
        )

    def test_hand_journeys(self, spark):
        from notion_spark.operators.behavior import attribution_last_touch

        t0 = datetime(2024, 1, 1)
        h = timedelta(hours=1)
        rows = [
            # u1: view, click, purchase(10.00) -> click
            (1, t0, 1, "view", None),
            (1, t0 + h, 2, "click", None),
            (1, t0 + 2 * h, 3, "purchase", 10.0),
            # u2: view, purchase 30h later with 24h window -> direct
            (2, t0, 4, "view", None),
            (2, t0 + 30 * h, 5, "purchase", 5.0),
            # u3: purchase with no channel history -> direct
            (3, t0, 6, "purchase", 2.5),
        ]
        out = {
            r.channel: (r.n_conversions, r.revenue_cents)
            for r in attribution_last_touch(
                self._ev(spark, rows), window_us=24 * 3_600_000_000
            ).collect()
        }
        assert out == {"click": (1, 1000), "direct": (2, 750)}

    def test_same_instant_tie_order(self, spark):
        from notion_spark.operators.behavior import attribution_last_touch

        t0 = datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "view", None),
            (1, t0, 2, "purchase", 1.0),  # view sorts first by tie -> view
            (2, t0, 4, "purchase", 1.0),  # click tie AFTER purchase -> direct
            (2, t0, 5, "click", None),
        ]
        out = {
            r.channel: r.n_conversions
            for r in attribution_last_touch(
                self._ev(spark, rows), window_us=10**9
            ).collect()
        }
        assert out == {"view": 1, "direct": 1}

    def test_validation(self, spark):
        import pytest

        from notion_spark.operators.behavior import attribution_last_touch

        df = self._ev(spark, [])
        with pytest.raises(ValueError):
            attribution_last_touch(df, revenue_type="view")
        with pytest.raises(ValueError):
            attribution_last_touch(df, window_us=0)


class TestRetentionDays:
    def test_hand_cohorts(self, spark):
        from notion_spark.operators.behavior import retention_days

        d = lambda i: datetime(2024, 1, 1 + i)  # noqa: E731
        rows = [
            (1, d(0)), (1, d(1)), (1, d(8)),    # d1 yes, d7 yes, d30 yes
            (2, d(0)), (2, d(10)),              # d30 only
            (3, d(2)),                          # second cohort, no return
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            str(r.cohort_day): (r.n_users, r.n_d1, r.n_d7, r.n_d30)
            for r in retention_days(df).collect()
        }
        assert out == {
            "2024-01-01": (2, 1, 1, 2),
            "2024-01-03": (1, 0, 0, 0),
        }
        row = [
            r for r in retention_days(df).collect()
            if str(r.cohort_day) == "2024-01-01"
        ][0]
        assert row.r_d1_micro == 500_000 and row.r_d30_micro == 1_000_000

    def test_validation(self, spark):
        import pytest

        from notion_spark.operators.behavior import retention_days

        df = spark.createDataFrame([], "user_id long, ts timestamp")
        with pytest.raises(ValueError):
            retention_days(df, day_offsets=[0])


class TestBounceRate:
    def test_hand_sessions(self, spark):
        from notion_spark.operators.behavior import bounce_rate

        t0 = datetime(2024, 1, 1, 9)
        rows = [
            (1, t0), (1, t0 + timedelta(minutes=5)),   # 2-event session
            (1, t0 + timedelta(hours=3)),              # bounce
            (2, t0 + timedelta(days=1)),               # bounce next day
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            str(r.day): (r.n_sessions, r.n_bounces, r.bounce_micro)
            for r in bounce_rate(df).collect()
        }
        assert out == {
            "2024-01-01": (2, 1, 500_000),
            "2024-01-02": (1, 1, 1_000_000),
        }


class TestPowerUserCurve:
    def test_hand_depths(self, spark):
        from notion_spark.operators.behavior import power_user_curve

        d = lambda i: datetime(2024, 1, 1 + i)  # noqa: E731
        rows = [(1, d(0)), (1, d(0)), (1, d(1)), (2, d(0)), (3, d(2))]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            r.n_active_days: r.n_users
            for r in power_user_curve(df).collect()
        }
        assert out == {2: 1, 1: 2}


class TestGrowthAccounting:
    def test_hand_weeks(self, spark):
        from notion_spark.operators.behavior import growth_accounting

        # 2024-01-01 is a Monday
        wk = lambda i, d=0: datetime(2024, 1, 1 + 7 * i + d)  # noqa: E731
        rows = [
            (1, wk(0)), (1, wk(1, 2)),  # active wk0+wk1, gone wk2
            (2, wk(0, 3)),              # active wk0 only
            (3, wk(2)),                 # new in wk2
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            str(r.week): (
                r.n_active, r.n_new, r.n_retained, r.n_resurrected,
                r.n_churned,
            )
            for r in growth_accounting(df).collect()
        }
        assert out == {
            "2024-01-01": (2, 2, 0, 0, 0),
            "2024-01-08": (1, 0, 1, 0, 1),   # u1 retained; u2 churned
            "2024-01-15": (1, 1, 0, 0, 1),   # u3 new; u1 churned
            "2024-01-22": (0, 0, 0, 0, 1),   # u3 churned
        }

    def test_resurrection(self, spark):
        from notion_spark.operators.behavior import growth_accounting

        wk = lambda i: datetime(2024, 1, 1 + 7 * i)  # noqa: E731
        rows = [(1, wk(0)), (1, wk(2))]  # skips wk1 -> resurrected wk2
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {str(r.week): r.n_resurrected for r in
               growth_accounting(df).collect()}
        assert out["2024-01-15"] == 1


class TestDegreeAssortativity:
    def test_hand_graph(self, spark):
        from notion_spark.operators.graph import degree_assortativity

        edges = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "x")], "s string, d string"
        )
        out = degree_assortativity(edges, "s", "d").collect()[0]
        # pairs (2,2),(2,1),(1,2): num=-1 den_x=den_y=2 -> rho2=.25
        assert out.n_edges == 3
        assert out.rho_sign == -1
        assert abs(out.rho2 - 0.25) < 1e-12

    def test_degenerate_null(self, spark):
        from notion_spark.operators.graph import degree_assortativity

        edges = spark.createDataFrame([("a", "x")], "s string, d string")
        out = degree_assortativity(edges, "s", "d").collect()[0]
        assert out.rho2 is None


class TestSeasonalityIndex:
    def test_hand_months(self, spark):
        from notion_spark.operators.timeseries import seasonality_index

        rows = [
            (datetime(2024, 1, 5), 100),
            (datetime(2024, 2, 5), 300),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, cents long")
        out = {
            r.month: (r.cents, r.index_micro)
            for r in seasonality_index(df, "ts", "cents").collect()
        }
        assert out == {1: (100, 3_000_000), 2: (300, 9_000_000)}


class TestHapaxStats:
    def test_hand_corpus(self, spark):
        from notion_spark.pipeline.text_analysis import hapax_stats

        df = spark.createDataFrame(
            [("a b A",), ("c",), (None,)], "text string"
        )
        out = hapax_stats(df).collect()[0]
        assert (out.n_tokens, out.n_vocab, out.n_hapax) == (4, 3, 2)
        assert out.hapax_micro == 666_667


class TestDupNgramStats:
    def test_hand_corpus(self, spark):
        from notion_spark.pipeline.text_analysis import dup_ngram_stats

        rows = [
            (1, "a b a b a"),   # bigrams: 'a b'x2, 'b a'x2 -> 2 excess of 4
            (2, "x y"),         # 1 bigram, unique
            (3, "z"),           # too short: 0 bigrams
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dup_ngram_stats(df, n=2).collect()[0]
        assert (out.n_docs, out.n_grams, out.n_dup_grams) == (3, 5, 2)
        assert out.dup_micro == 400_000

    def test_cross_doc_not_counted(self, spark):
        from notion_spark.pipeline.text_analysis import dup_ngram_stats

        # the same bigram in two DIFFERENT docs is not a within-doc dup
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], "doc_id long, text string"
        )
        out = dup_ngram_stats(df, n=2).collect()[0]
        assert out.n_dup_grams == 0 and out.n_grams == 2


class TestOovRate:
    def test_hand_vocab(self, spark):
        from notion_spark.pipeline.text_analysis import oov_rate

        df = spark.createDataFrame(
            [("a a a b b c",)], "text string"
        )
        out = oov_rate(df, vocab_k=2).collect()[0]
        # top-2 = a(3), b(2) -> covered 5 of 6, oov = 1/6
        assert (out.n_total, out.n_covered) == (6, 5)
        assert out.oov_micro == 166_667

    def test_tie_breaks_token_asc(self, spark):
        from notion_spark.pipeline.text_analysis import oov_rate

        df = spark.createDataFrame([("b a b a c",)], "text string")
        # a(2) b(2) c(1); k=1 -> 'a' by token asc -> covered 2
        out = oov_rate(df, vocab_k=1).collect()[0]
        assert out.n_covered == 2


class TestArpuCard:
    def test_hand_card(self, spark):
        from notion_spark.operators.behavior import arpu_card

        t = datetime(2024, 1, 1)
        rows = [
            (1, t, 1, "view", None),
            (1, t, 2, "purchase", 10.0),
            (2, t, 3, "view", None),
            (3, t, 4, "purchase", 5.0),
            (3, t, 5, "purchase", 2.0),
        ]
        df = spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double",
        )
        out = arpu_card(df).collect()[0]
        assert (out.revenue_cents, out.n_users, out.n_payers) == (1700, 3, 2)
        # arpu = 1700/3 cents in micro-cents, half-up
        assert out.arpu_micro_cents == 566_666_667
        assert out.arppu_micro_cents == 850_000_000
        assert out.payer_share_micro == 666_667


class TestGiniByGroup:
    def test_matches_global_per_group(self, spark):
        from notion_spark.pipeline.stats import gini_by_group, gini_coefficient

        rows = [
            ("g1", 10, 1), ("g1", 20, 2), ("g1", 70, 3),
            ("g2", 25, 4), ("g2", 25, 5), ("g2", 25, 6), ("g2", 25, 7),
        ]
        df = spark.createDataFrame(rows, "g string, x long, k long")
        out = {r.g: (r.n, r.total, r.gini_micro)
               for r in gini_by_group(df, "g", "x", "k").collect()}
        for g in ("g1", "g2"):
            ref = gini_coefficient(
                df.filter(F.col("g") == g), "x", "k"
            ).collect()[0]
            assert out[g] == (ref.n, ref.total, ref.gini_micro), g
        assert out["g2"][2] == 0  # perfectly even split

    def test_negative_raises(self, spark):
        import pytest

        from notion_spark.pipeline.stats import gini_by_group

        df = spark.createDataFrame([("g", -1, 1)], "g string, x long, k long")
        with pytest.raises(Exception, match="non-negative"):
            gini_by_group(df, "g", "x", "k").collect()


class TestBurstinessIndex:
    def test_hand_days(self, spark):
        from notion_spark.operators.timeseries import burstiness_index

        rows = (
            [(datetime(2024, 1, 1, h),) for h in range(1)]     # day1: 1
            + [(datetime(2024, 1, 2, h),) for h in range(3)]   # day2: 3
            + [(datetime(2024, 1, 3, h),) for h in range(8)]   # day3: 8
        )
        df = spark.createDataFrame(rows, "ts timestamp")
        out = burstiness_index(df, "ts").collect()[0]
        # x=(1,3,8): n=3 sx=12 sxx=74; fano=(3*74-144)/(3*12)=78/36
        assert (out.n_days, out.n_events) == (3, 12)
        assert out.fano_micro == 2_166_667
        assert out.peak_micro == 2_000_000  # 3*8/12

    def test_constant_rate_poisson_floor(self, spark):
        from notion_spark.operators.timeseries import burstiness_index

        rows = [(datetime(2024, 1, d, h),) for d in (1, 2) for h in (1, 2)]
        out = burstiness_index(
            spark.createDataFrame(rows, "ts timestamp"), "ts"
        ).collect()[0]
        assert out.fano_micro == 0 and out.peak_micro == 1_000_000


class TestDedupRateCard:
    def test_hand_corpus(self, spark):
        from notion_spark.pipeline.dedup import dedup_rate_card

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, None)],
            "doc_id long, text string",
        )
        out = dedup_rate_card(df).collect()[0]
        assert (out.n_docs, out.n_unique, out.n_dups) == (3, 2, 1)
        assert out.dup_micro == 333_333
