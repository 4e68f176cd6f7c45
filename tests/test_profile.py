"""Table profiler: planted-data semantics + the two-pass plan shape."""

from __future__ import annotations

import pytest

from notion_spark.pipeline.profile import profile_table


def _df(spark):
    rows = [
        (1, "en", 10.5, None),
        (2, "en", 2.0, None),
        (3, None, 30.0, None),
        (4, "fr", 4.25, None),
    ]
    return spark.createDataFrame(rows, "id long, lang string, score double, gone string")


def test_profile_semantics(spark):
    prof = {r.col_name: r for r in
            profile_table(_df(spark), ["id", "lang", "score", "gone"]).collect()}
    assert set(prof) == {"id", "lang", "score", "gone"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["lang"].n_null == 1 and prof["lang"].null_frac == 0.25
    # typed-first min/max: numeric order, not lexicographic ("10.5" < "2.0")
    assert prof["score"].min_value == "2.0" and prof["score"].max_value == "30.0"
    assert prof["id"].min_value == "1" and prof["id"].max_value == "4"
    # tiny cardinalities sit in the HLL linear-counting regime:
    # 256*ln(256/(256-n)) — within a few percent of truth, never wild
    assert abs(prof["id"].est_distinct - 4) < 0.5
    assert abs(prof["lang"].est_distinct - 2) < 0.5
    # an all-null column: never reaches the sketch, 0 distinct, frac 1
    assert prof["gone"].est_distinct == 0.0 and prof["gone"].null_frac == 1.0
    assert prof["gone"].min_value is None and prof["gone"].max_value is None


def test_profile_single_sketch_shuffle(spark):
    df = _df(spark)
    plan = (
        profile_table(df, ["id", "lang", "score"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # pass 1 is a global aggregate (SinglePartition exchange). Exactly
    # two hash shuffles remain: the stacked HLL register groupBy (the
    # only DATA-sized one) and the bounded register->estimate re-agg;
    # the meta x est join must broadcast. A count_distinct-per-column
    # formulation would add a full-cardinality shuffle per column.
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in plan


class TestDiversityIndex:
    def test_gini_exact_values(self, spark):
        from notion_spark.pipeline.profile import diversity_index

        # one group: labels a,a,b,c -> n=4, sumsq=4+1+1=6, gini=(16-6)/16
        df = spark.createDataFrame([("a",), ("a",), ("b",), ("c",)], "lbl string")
        r = diversity_index(df, "lbl").collect()[0]
        assert (r.n, r.n_labels) == (4, 3)
        assert (int(r.gini_num), int(r.gini_den)) == (10, 16)
        assert r.gini == 0.625

    def test_single_label_is_zero_and_nulls_count_as_category(self, spark):
        from notion_spark.pipeline.profile import diversity_index

        df = spark.createDataFrame([("x",), ("x",)], "lbl string")
        assert diversity_index(df, "lbl").collect()[0].gini == 0.0
        # null is its own category: x,x,null -> (9 - (4+1))/9 = 4/9
        df2 = spark.createDataFrame([("x",), ("x",), (None,)], "lbl string")
        r = df2.transform(lambda d: diversity_index(d, "lbl")).collect()[0]
        assert r.n_labels == 2 and r.gini == 0.444444

    def test_per_group(self, spark):
        from notion_spark.pipeline.profile import diversity_index

        df = spark.createDataFrame(
            [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "a")],
            "g string, lbl string",
        )
        out = {r.g: r.gini for r in diversity_index(df, "lbl", by="g").collect()}
        assert out == {"g1": 0.5, "g2": 0.0}


class TestCompareProfiles:
    def test_drift_detection(self, spark):
        from notion_spark.pipeline.profile import compare_profiles, profile_table

        before = spark.createDataFrame(
            [(1, "x"), (2, "y")], "id long, s string"
        )
        after = spark.createDataFrame(
            [(1, "x"), (2, None), (3, None), (9, "z")], "id long, s string"
        )
        out = {
            r.col_name: r
            for r in compare_profiles(
                profile_table(before), profile_table(after)
            ).collect()
        }
        # s: nulls 0/2 -> 2/4 = 500000 ppm delta -> alert
        assert out["s"].null_ppm_before == 0
        assert out["s"].null_ppm_after == 500_000
        assert out["s"].null_ppm_delta == 500_000 and out["s"].alert
        # id max moved 2 -> 9
        assert out["id"].max_changed and not out["id"].min_changed
        assert not out["id"].alert

    def test_missing_column_alerts(self, spark):
        from notion_spark.pipeline.profile import compare_profiles, profile_table

        before = spark.createDataFrame([(1, "x")], "id long, s string")
        after = spark.createDataFrame([(1,)], "id long")
        out = {
            r.col_name: r
            for r in compare_profiles(
                profile_table(before), profile_table(after)
            ).collect()
        }
        assert out["s"].alert and out["s"].n_rows_after is None

    def test_empty_snapshot_side_still_alerts(self, spark):
        from pyspark.sql import functions as F

        from notion_spark.pipeline.profile import compare_profiles, profile_table

        before = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
        empty = before.filter(F.lit(False))
        out = {
            r.col_name: r
            for r in compare_profiles(
                profile_table(before), profile_table(empty)
            ).collect()
        }
        # n_rows=0 on the after side -> ppm is NULL; the gate must fire
        # (true), never evaluate to NULL and silently pass
        for c in ("id", "s"):
            assert out[c].null_ppm_after is None
            assert out[c].alert is True


class TestNumericCorrelations:
    def _rows(self, spark, rows):
        from notion_spark.pipeline.profile import numeric_correlations

        df = spark.createDataFrame(rows, "x long, y long, z long")
        out = numeric_correlations(df, ["x", "y", "z"]).collect()
        return {(r.col_x, r.col_y): r for r in out}

    def test_perfect_linear_and_exact_cov(self, spark):
        # y = 2x: num = 2*den_x and den_y = 4*den_x exactly, so
        # r2 == 1.0 BIT-exactly (small integers -> exact doubles)
        rows = [(1, 2, 5), (2, 4, 5), (3, 6, 5), (4, 8, 5)]
        p = self._rows(spark, rows)
        xy = p[("x", "y")]
        assert xy.n == 4 and xy.r_sign == 1 and xy.r2 == 1.0
        # cov = (n*Sxy - Sx*Sy)/(n(n-1)) = (4*60 - 10*20)/12 = 40/12
        assert xy.cov == 40.0 / 12.0
        # z is constant: den_z = 0 -> r2 null, cov exactly 0
        assert p[("x", "z")].r2 is None and p[("x", "z")].cov == 0.0

    def test_negative_sign_and_listwise_nulls(self, spark):
        rows = [(1, 8, 1), (2, 6, 2), (3, 4, 3), (4, 2, 4), (5, None, 5)]
        p = self._rows(spark, rows)
        # the null-y row drops from EVERY pair (single listwise n)
        assert all(r.n == 4 for r in p.values())
        assert p[("x", "y")].r_sign == -1 and p[("x", "y")].r2 == 1.0
        assert p[("x", "z")].r_sign == 1

    def test_needs_two_cols_and_overflow_guard(self, spark):
        import pytest
        from notion_spark.pipeline.profile import numeric_correlations

        with pytest.raises(ValueError):
            numeric_correlations(spark.range(3), ["id"])
        # 10^18-scale values: n*Σx² ≈ 1.2e38 outgrows DECIMAL(38,0) —
        # the in-plan guard must raise loudly, never wrap/null silently
        big = spark.createDataFrame(
            [(10**18, 10**18)] * 12, "x long, y long"
        )
        with pytest.raises(Exception, match="numeric_correlations"):
            numeric_correlations(big, ["x", "y"]).collect()

    def test_single_pass_no_data_shuffle(self, spark):
        from notion_spark.pipeline.profile import numeric_correlations

        df = spark.createDataFrame([(1, 2), (3, 4)], "x long, y long")
        plan = (
            numeric_correlations(df, ["x", "y"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one global aggregate: the only exchange is the 1-row partial
        # collapse to a single partition — never a hash repartition
        assert "hashpartitioning" not in plan


class TestBenfordProfile:
    def test_known_digits_and_exact_ppm(self, spark):
        from notion_spark.pipeline.profile import benford_profile

        # 4 values: digits 1, 1, 2, 9 — obs 500000/250000/250000 ppm
        df = spark.createDataFrame([(123,), (1,), (250,), (9000,)], "v long")
        out = {r.digit: r for r in benford_profile(df, "v").collect()}
        assert len(out) == 9                       # zero digits included
        assert out[1].n == 2 and out[1].obs_ppm == 500000
        assert out[2].n == 1 and out[2].obs_ppm == 250000
        assert out[9].n == 1 and out[3].n == 0 and out[3].obs_ppm == 0
        assert out[1].deviation_ppm == 500000 - 301030
        # expected side is an exact partition of 1e6
        assert sum(r.expected_ppm for r in out.values()) == 1_000_000

    def test_nonpositive_and_null_excluded(self, spark):
        from notion_spark.pipeline.profile import benford_profile

        df = spark.createDataFrame([(5,), (0,), (-7,), (None,)], "v long")
        out = {r.digit: r for r in benford_profile(df, "v").collect()}
        assert out[5].n == 1 and out[5].obs_ppm == 1_000_000
        assert sum(r.n for r in out.values()) == 1

    def test_empty_input_reports_zero_rates(self, spark):
        from notion_spark.pipeline.profile import benford_profile

        df = spark.createDataFrame([], "v long")
        out = benford_profile(df, "v").collect()
        assert len(out) == 9 and all(r.n == 0 and r.obs_ppm == 0 for r in out)


def test_tv_distance_hand_cases(spark):
    from notion_spark.pipeline.profile import tv_distance

    rows = [("a", "x")] * 6 + [("a", "y")] * 4 + [("b", "x")] * 2 + [("b", "y")] * 8
    df = spark.createDataFrame(rows, "g string, c string")
    r = tv_distance(df, "g", "c", "a", "b").collect()[0]
    assert r.tv_micro == 400_000  # 0.5*(|.6-.2| + |.4-.8|)
    assert r.n_categories == 2 and r.n_a == 10 and r.n_b == 10
    # identical mixes -> 0
    same = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "g string, c string")
    assert tv_distance(same, "g", "c", "a", "b").collect()[0].tv_micro == 0
    # disjoint supports -> exactly 1e6, one-sided categories counted
    disj = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "z")], "g string, c string")
    r3 = tv_distance(disj, "g", "c", "a", "b").collect()[0]
    assert r3.tv_micro == 1_000_000 and r3.n_categories == 2


def test_tv_distance_empty_cohort_null(spark):
    from notion_spark.pipeline.profile import tv_distance

    df = spark.createDataFrame([("a", "x")], "g string, c string")
    assert tv_distance(df, "g", "c", "a", "b").collect()[0].tv_micro is None


def test_numeric_correlations_by_group(spark):
    from notion_spark.pipeline.profile import numeric_correlations

    rows = [("g1", i, 2 * i + 1) for i in range(10)] + [
        ("g2", i, -3 * i) for i in range(10)] + [(None, 1, 1)]
    df = spark.createDataFrame(rows, "g string, x int, y int")
    out = {r.group: r for r in numeric_correlations(df, ["x", "y"], by="g").collect()}
    assert set(out) == {"g1", "g2"}  # NULL group excluded
    assert out["g1"].r_sign == 1 and out["g1"].r2 == pytest.approx(1.0)
    assert out["g2"].r_sign == -1 and out["g2"].r2 == pytest.approx(1.0)
    assert out["g1"].n == 10
    # flat path unchanged: no group column
    flat = numeric_correlations(df, ["x", "y"]).collect()[0]
    assert "group" not in flat.asDict()


class TestColumnCardinalities:
    def test_hand_card(self, spark):
        from notion_spark.pipeline.profile import column_cardinalities

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (4, "b")], "k long, c string")
        out = {r.column: r for r in column_cardinalities(df, ["k", "c"]).collect()}
        assert out["k"].n_rows == 4 and out["k"].n_distinct == 4
        assert out["k"].n_null == 0 and out["k"].distinct_ratio_micro == 1_000_000
        assert out["c"].n_distinct == 2 and out["c"].n_null == 1
        # distinct ratio over NON-NULL rows: 2/3
        assert out["c"].distinct_ratio_micro == 666_667
        assert out["c"].null_ratio_micro == 250_000

    def test_empty_and_validation(self, spark):
        import pytest
        from notion_spark.pipeline.profile import column_cardinalities

        df = spark.createDataFrame([], "k long")
        out = column_cardinalities(df, ["k"]).collect()[0]
        assert out.n_rows == 0 and out.distinct_ratio_micro is None
        with pytest.raises(ValueError):
            column_cardinalities(df, [])
