

class TestIqrOutliers:
    def test_hand_fences(self, spark):
        from notion_spark.operators.anomaly import iqr_outliers

        # g: values 1..8 plus outliers -100, 100
        rows = [("g", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, -100, 100]]
        df = spark.createDataFrame(rows, "grp string, v long")
        out = iqr_outliers(df, "grp", "v").collect()[0]
        # lower-quantile convention over 10 values: q1 = v with cum>=2.5
        # -> 3rd smallest = 2; q3 = v with cum >= 7.5 -> 8th = 7
        assert (out.q1, out.q3) == (2, 7)
        # fences doubled: low 2v < 4 - 15 -> v < -5.5; high 2v > 14+15
        assert out.n_low == 1 and out.n_high == 1 and out.n == 10

    def test_no_outliers_constant(self, spark):
        from notion_spark.operators.anomaly import iqr_outliers

        df = spark.createDataFrame([("g", 5)] * 4, "grp string, v long")
        out = iqr_outliers(df, "grp", "v").collect()[0]
        assert out.n_low == 0 and out.n_high == 0 and out.q1 == out.q3 == 5
