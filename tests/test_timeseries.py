"""Time-series densification + exact trend fit (operators/timeseries)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from notion_spark.operators.timeseries import groupwise_linfit, resample_fill


def _ev(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0)
    rows = [
        Row(k="a", ts=t0, v=10.0),
        Row(k="a", ts=t0 + dt.timedelta(days=1, hours=3), v=20.0),
        # 2-day gap
        Row(k="a", ts=t0 + dt.timedelta(days=4), v=5.0),
        Row(k="b", ts=t0, v=1.0),
    ]
    return spark.createDataFrame(rows)


class TestResampleFill:
    def test_gaps_emitted_and_filled(self, spark):
        out = resample_fill(_ev(spark), "k", "ts", "v", period="1 day")
        a = sorted(
            (r["period_start"].day, r["n_events"], r["is_gap"], r["filled_value"])
            for r in out.collect()
            if r["k"] == "a"
        )
        # days 1..5: events on 1,2,5; gaps on 3,4 carry day-2's sum
        assert [x[0] for x in a] == [1, 2, 3, 4, 5]
        assert [x[1] for x in a] == [1, 1, 0, 0, 1]
        assert [x[2] for x in a] == [False, False, True, True, False]
        assert a[2][3] == Decimal("20.00") and a[3][3] == Decimal("20.00")

    def test_single_event_key(self, spark):
        out = resample_fill(_ev(spark), "k", "ts", "v").filter(F.col("k") == "b")
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["n_events"] == 1 and not rows[0]["is_gap"]

    def test_span_guard_raises(self, spark):
        rows = [
            Row(k="x", ts=dt.datetime(1970, 1, 1), v=1.0),
            Row(k="x", ts=dt.datetime(2200, 1, 1), v=1.0),
        ]
        bad = spark.createDataFrame(rows)
        with pytest.raises(Exception, match="max_periods"):
            resample_fill(bad, "k", "ts", "v", max_periods=100).collect()

    def test_bad_period_rejected(self, spark):
        with pytest.raises(ValueError):
            resample_fill(_ev(spark), "k", "ts", "v", period="1 fortnight")


class TestGroupwiseLinfit:
    def test_matches_numpy_polyfit(self, spark):
        xs = [0.0, 1.0, 2.0, 3.0, 4.0]
        ys = [1.0, 3.1, 4.9, 7.2, 8.8]
        df = spark.createDataFrame([Row(g="g", x=x, y=y) for x, y in zip(xs, ys)])
        row = groupwise_linfit(df, "g", "x", "y").first()
        import numpy as np

        want = np.polyfit(xs, ys, 1)[0]
        assert row["slope"] == pytest.approx(want, rel=1e-9)
        # exact ratio agrees with the double
        assert float(row["slope_num"]) / float(row["slope_den"]) == pytest.approx(
            row["slope"], rel=1e-12
        )

    def test_constant_x_and_singleton_null_slope(self, spark):
        df = spark.createDataFrame(
            [Row(g="c", x=2.0, y=1.0), Row(g="c", x=2.0, y=9.0), Row(g="s", x=1.0, y=1.0)]
        )
        out = {r["g"]: r for r in groupwise_linfit(df, "g", "x", "y").collect()}
        assert out["c"]["slope"] is None  # den = 0
        assert out["s"]["slope"] is None  # n = 1

    def test_partitioning_invariant_exact(self, spark):
        df = spark.createDataFrame(
            [Row(g="g", x=float(i % 17), y=float((i * 7919) % 101)) for i in range(200)]
        )
        a = groupwise_linfit(df, "g", "x", "y").first()
        b = groupwise_linfit(df.repartition(13), "g", "x", "y").first()
        assert (a["slope_num"], a["slope_den"], a["slope"]) == (
            b["slope_num"],
            b["slope_den"],
            b["slope"],
        )


def test_multi_unit_period_rejected(spark):
    """'2 days' would bucket on the 1-day grid but step the calendar by
    2 days — off-grid events would silently vanish; must raise."""
    with pytest.raises(ValueError, match="single-unit"):
        resample_fill(_ev(spark), "k", "ts", "v", period="2 days")
    with pytest.raises(ValueError, match="single-unit"):
        resample_fill(_ev(spark), "k", "ts", "v", period="12 hours")


def test_null_timestamps_excluded(spark):
    import datetime as dt2

    from pyspark.sql import Row

    rows = [
        Row(k="a", ts=dt2.datetime(2026, 1, 1), v=1.0),
        Row(k="a", ts=None, v=99.0),
    ]
    out = resample_fill(spark.createDataFrame(rows), "k", "ts", "v").collect()
    assert len(out) == 1 and out[0]["n_events"] == 1  # null-ts row excluded


def test_linfit_overflow_guard_raises(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g="g", x=1.0e12 * i, y=1.0e12 * (i % 2)) for i in range(4)]
    )
    with pytest.raises(Exception, match="groupwise_linfit"):
        groupwise_linfit(df, "g", "x", "y").collect()


class TestAutocorrelation:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts long, event_id long, value double"
        )

    def test_linear_series_is_perfectly_autocorrelated(self, spark):
        from notion_spark.operators.timeseries import autocorrelation

        rows = [(1, t, t, float(t)) for t in range(1, 9)]
        out = {r.lag: r for r in autocorrelation(self._ev(spark, rows), "value", "user_id").collect()}
        # x_{t+k} = x_t + k: exact small-integer moments make r2 == 1.0
        # BIT-exactly, positive sign, n = len - k pairs
        for k in (1, 2, 3):
            assert out[k].r2 == 1.0 and out[k].r_sign == 1
            assert out[k].n_pairs == 8 - k

    def test_alternating_series_signs(self, spark):
        from notion_spark.operators.timeseries import autocorrelation

        rows = [(1, t, t, 1.0 if t % 2 == 0 else -1.0) for t in range(8)]
        out = {r.lag: r for r in autocorrelation(self._ev(spark, rows), "value", "user_id", lags=(1, 2)).collect()}
        assert out[1].r_sign == -1 and out[1].r2 == 1.0
        assert out[2].r_sign == 1 and out[2].r2 == 1.0

    def test_pairs_never_span_series_and_constant_is_null(self, spark):
        from notion_spark.operators.timeseries import autocorrelation

        rows = [(u, t, t, float(t)) for u in (1, 2) for t in (1, 2)]
        out = autocorrelation(self._ev(spark, rows), "value", "user_id", lags=(1,)).collect()
        assert out[0].n_pairs == 2  # one within-user pair per user, never 3
        const = [(1, t, t, 5.0) for t in range(4)]
        out2 = autocorrelation(self._ev(spark, const), "value", "user_id", lags=(1,)).collect()
        assert out2[0].r2 is None and out2[0].r_sign == 0

    def test_lag_validation(self, spark):
        import pytest
        from notion_spark.operators.timeseries import autocorrelation

        with pytest.raises(ValueError):
            autocorrelation(self._ev(spark, []), "value", "user_id", lags=(0,))


class TestDowProfile:
    def test_complete_shape_and_pinned_dow(self, spark):
        from datetime import datetime
        from notion_spark.operators.timeseries import dow_profile

        # 2024-01-01 was a Monday -> dow 1 under (days+4)%7, 0=Sunday
        rows = [
            ("e1", datetime(2024, 1, 1), "a"),   # Mon
            ("e2", datetime(2024, 1, 1, 8), "a"),
            ("e3", datetime(2024, 1, 2), "a"),   # Tue
            ("e4", datetime(2024, 1, 7), "a"),   # Sun
            ("e5", datetime(2024, 1, 3), "b"),   # Wed
        ]
        df = spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")
        out = dow_profile(df)
        rows_a = {r.dow: r for r in out.filter("series = 'a'").collect()}
        assert set(rows_a) == set(range(7))  # complete 7-row shape
        assert rows_a[1].n == 2 and rows_a[2].n == 1 and rows_a[0].n == 1
        assert rows_a[3].n == 0 and rows_a[3].share_ppm == 0
        assert rows_a[1].share_ppm == 500_000  # 2 of 4, half-up exact
        assert rows_a[1].deviation_ppm == 500_000 - 142_857
        assert rows_a[3].deviation_ppm == -142_857
        b = {r.dow: r for r in out.filter("series = 'b'").collect()}
        assert b[3].n == 1 and b[3].share_ppm == 1_000_000

    def test_pre_1970_dates_land_in_grid(self, spark):
        # ADVICE r10: Spark % keeps the dividend sign, so negative
        # days-since-epoch produced dows in -6..-1 that vanished from
        # the 0..6 grid while still inflating the series total. pmod
        # fix: 1969-12-31 (day -1) was a Wednesday -> dow 3.
        from datetime import datetime
        from notion_spark.operators.timeseries import dow_profile

        rows = [
            ("e1", datetime(1969, 12, 31), "a"),  # Wed, day -1
            ("e2", datetime(1969, 12, 28), "a"),  # Sun, day -4
            ("e3", datetime(1970, 1, 1), "a"),    # Thu, day 0
        ]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, event_type string"
        )
        out = {r.dow: r for r in dow_profile(df).collect()}
        assert set(out) == set(range(7))
        assert out[3].n == 1 and out[0].n == 1 and out[4].n == 1
        assert sum(r.n for r in out.values()) == 3  # nothing vanishes
        assert abs(sum(r.share_ppm for r in out.values()) - 1_000_000) <= 7

    def test_share_sums_near_million(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import dow_profile

        rows = [("e%d" % i, datetime(2024, 1, 1) + timedelta(days=i), "t")
                for i in range(23)]
        df = spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")
        shares = [r.share_ppm for r in dow_profile(df).collect()]
        # half-up rounding keeps the 7-way split within 7 ppm of 1e6
        assert abs(sum(shares) - 1_000_000) <= 7


class TestCusumChangepoint:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "event_id string, ts timestamp, event_type string")

    def test_level_shift_detected_at_regime_boundary(self, spark):
        from datetime import date, datetime, timedelta
        from notion_spark.operators.timeseries import cusum_changepoint

        rows = []
        for d in range(20):
            for i in range(2 if d < 10 else 8):
                rows.append((f"e{d}_{i}",
                             datetime(2024, 1, 1) + timedelta(days=d, hours=i), "a"))
        r = cusum_changepoint(self._ev(spark, rows)).collect()[0]
        # |S| peaks on the LAST day of the old regime (Jan 10)
        assert r.changepoint_day == (date(2024, 1, 10) - date(1970, 1, 1)).days
        # |T|max = |20*20 - 10*100| = 600 over n*total = 2000 -> 0.3
        assert r.cusum_micro == 300_000
        assert r.n_days == 20 and r.total == 100

    def test_flat_series_near_zero(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import cusum_changepoint

        rows = [(f"e{d}", datetime(2024, 1, 1) + timedelta(days=d), "a")
                for d in range(10)]
        r = cusum_changepoint(self._ev(spark, rows)).collect()[0]
        assert r.cusum_micro == 0  # perfectly flat: S_t == 0 everywhere

    def test_series_isolated(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import cusum_changepoint

        rows = [(f"a{d}", datetime(2024, 1, 1) + timedelta(days=d), "a")
                for d in range(5)]
        rows += [(f"b{d}", datetime(2024, 1, 1) + timedelta(days=d), "b")
                 for d in range(3)]
        out = {r.series: r for r in cusum_changepoint(self._ev(spark, rows)).collect()}
        assert out["a"].n_days == 5 and out["b"].n_days == 3


class TestTimeWeightedAvg:
    def test_step_integral_hand_case(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import time_weighted_avg

        T0 = datetime(2024, 1, 1)
        rows = [("u", "e1", T0, 10),
                ("u", "e2", T0 + timedelta(seconds=30), 20),
                ("u", "e3", T0 + timedelta(seconds=40), 0)]
        df = spark.createDataFrame(rows, "user_id string, event_id string, ts timestamp, v int")
        r = time_weighted_avg(df, "v").collect()[0]
        # 10 held 30s, 20 held 10s -> (300 + 200)/40 = 12.5
        assert r.twa_micro == 12_500_000
        assert r.span_us == 40_000_000 and r.n_obs == 3

    def test_sampling_frequency_invariance(self, spark):
        # resampling a constant-hold series more often must not move TWA
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import time_weighted_avg

        T0 = datetime(2024, 1, 1)
        sparse = [("u", f"e{i}", T0 + timedelta(seconds=t), v)
                  for i, (t, v) in enumerate([(0, 10), (60, 30), (90, 30)])]
        dense = sparse + [("u", "x1", T0 + timedelta(seconds=70), 30),
                          ("u", "x2", T0 + timedelta(seconds=80), 30)]
        a = time_weighted_avg(
            spark.createDataFrame(sparse, "user_id string, event_id string, ts timestamp, v int"),
            "v").collect()[0]
        b = time_weighted_avg(
            spark.createDataFrame(dense, "user_id string, event_id string, ts timestamp, v int"),
            "v").collect()[0]
        assert a.twa_micro == b.twa_micro  # plain mean would differ

    def test_single_observation_excluded(self, spark):
        from datetime import datetime
        from notion_spark.operators.timeseries import time_weighted_avg

        df = spark.createDataFrame(
            [("u", "e", datetime(2024, 1, 1), 5)],
            "user_id string, event_id string, ts timestamp, v int")
        assert time_weighted_avg(df, "v").count() == 0  # zero span


class TestGapReport:
    def test_hand_gaps(self, spark):
        from datetime import datetime
        from notion_spark.operators.timeseries import gap_report

        rows = [
            ("e1", datetime(2024, 1, 1, 0), "a"),
            ("e2", datetime(2024, 1, 1, 1), "a"),    # gap 1h
            ("e3", datetime(2024, 1, 3, 1), "a"),    # gap 48h (> 1 day)
            ("e4", datetime(2024, 1, 1), "b"),
        ]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, event_type string")
        out = {r.series: r for r in gap_report(df).collect()}
        a = out["a"]
        assert a.n_events == 3
        assert a.span_us == 49 * 3600 * 1_000_000
        assert a.max_gap_us == 48 * 3600 * 1_000_000
        assert a.n_gaps_over == 1
        # mean gap = span/(n-1) half-up micro
        assert a.mean_gap_micro_us == (49 * 3600 * 1_000_000 * 1_000_000) // 2
        b = out["b"]
        assert b.n_events == 1 and b.max_gap_us is None
        assert b.mean_gap_micro_us is None and b.span_us == 0

    def test_equal_timestamps_zero_gap(self, spark):
        from datetime import datetime
        from notion_spark.operators.timeseries import gap_report

        t = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("x", t, "s"), ("y", t, "s")],
            "event_id string, ts timestamp, event_type string")
        out = gap_report(df).collect()[0]
        assert out.max_gap_us == 0 and out.n_gaps_over == 0


class TestEwmaDaily:
    def test_constant_series_converges_to_rate(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import (
            EWMA_WEIGHTS_MICRO, ewma_daily)

        rows = [("e%d" % d, datetime(2024, 1, 1) + timedelta(days=d), "s")
                for d in range(12)]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, event_type string")
        out = sorted((r.day, r.n, r.ewma_micro) for r in ewma_daily(df).collect())
        # 12 days, full 8-day windows start on day 8 (index 7) -> 5 rows
        assert len(out) == 5
        # constant 1/day: weighted sum = mass -> ewma exactly 1e6
        assert all(e == 1_000_000 for _, _, e in out)

    def test_spike_decay_matches_pinned_weights(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import (
            EWMA_WEIGHTS_MICRO, ewma_daily)

        # one spike of 10 on day 7 (first full-window day), zeros after
        rows = [("e%d" % i, datetime(2024, 1, 8, i), "s") for i in range(10)]
        rows += [("a", datetime(2024, 1, 1), "s"), ("b", datetime(2024, 1, 12), "s")]
        df = spark.createDataFrame(
            rows, "event_id string, ts timestamp, event_type string")
        out = {r.day: r.ewma_micro for r in ewma_daily(df).collect()}
        mass = sum(EWMA_WEIGHTS_MICRO)
        # day 8 (spike is lag 0): 10*w0 / mass, half-up micro of counts
        def hu(num, den):
            return (2 * num * 1_000_000 + den) // (2 * den)
        # day 8 window = days 1..8: spike (10) at lag 0 + the day-1
        # event at lag 7
        assert out["2024-01-08"] == hu(
            10 * EWMA_WEIGHTS_MICRO[0] + EWMA_WEIGHTS_MICRO[7], mass)
        # day 10 window = days 3..10: spike at lag 2 only
        assert out["2024-01-10"] == hu(10 * EWMA_WEIGHTS_MICRO[2], mass)


class TestCrossCorrelation:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id string, ts timestamp, event_type string")

    def test_shifted_copy_perfect_at_lag(self, spark):
        from datetime import datetime, timedelta
        from notion_spark.operators.timeseries import cross_correlation

        t0 = datetime(2024, 1, 1)
        rows = []
        # series a: volume d+1 on day d (0..9); series b: same shape
        # shifted +2 days -> corr(a_t, b_{t+2}) perfect positive
        for d in range(10):
            rows += [("a%d_%d" % (d, i), t0 + timedelta(days=d), "A")
                     for i in range(d + 1)]
            rows += [("b%d_%d" % (d, i), t0 + timedelta(days=d + 2), "B")
                     for i in range(d + 1)]
        out = {r.lag: r for r in cross_correlation(
            self._ev(spark, rows), "A", "B", lags=(0, 2)).collect()}
        assert out[2].r_sign == 1 and abs(out[2].r2 - 1.0) < 1e-9
        assert out[2].n_days == 10  # a-days 0..11 grid minus 2-day shift
        assert out[0].r2 < 1.0  # unshifted alignment is not perfect

    def test_lag_validation(self, spark):
        import pytest
        from notion_spark.operators.timeseries import cross_correlation

        with pytest.raises(ValueError):
            cross_correlation(self._ev(spark, []), "A", "B", lags=(-1,))
