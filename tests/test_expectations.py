

class TestRateDrift:
    def test_weekly_rates_and_delta(self, spark):
        from datetime import datetime
        from pyspark.sql import functions as F
        from notion_spark.pipeline.expectations import rate_drift

        # week of Jan 1 2024 (Mon): 1 hit of 4; week of Jan 8: 3 of 4
        rows = ([(datetime(2024, 1, 2), "error")] + [(datetime(2024, 1, 3), "ok")] * 3
                + [(datetime(2024, 1, 9), "error")] * 3 + [(datetime(2024, 1, 10), "ok")])
        df = spark.createDataFrame(rows, "ts timestamp, kind string")
        out = {r.week: r for r in rate_drift(
            df, F.col("kind") == "error").collect()}
        assert out["2024-01-01"].rate_micro == 250_000
        assert out["2024-01-01"].delta_micro is None
        assert out["2024-01-08"].rate_micro == 750_000
        assert out["2024-01-08"].delta_micro == 500_000

    def test_null_predicate_counts_as_miss(self, spark):
        from datetime import datetime
        from pyspark.sql import functions as F
        from notion_spark.pipeline.expectations import rate_drift

        df = spark.createDataFrame(
            [(datetime(2024, 1, 2), None), (datetime(2024, 1, 2), "error")],
            "ts timestamp, kind string")
        out = rate_drift(df, F.col("kind") == "error").collect()[0]
        assert out.n == 2 and out.n_hits == 1 and out.rate_micro == 500_000


class TestReconciliationAudit:
    def test_hand_books(self, spark):
        from pyspark.sql import functions as F
        from notion_spark.pipeline.expectations import reconciliation_audit

        parent = spark.createDataFrame(
            [(1, 100), (2, 50), (3, 10)], "k long, total long")
        child = spark.createDataFrame(
            [(1, 60), (1, 40), (2, 49), (4, 5)], "k long, amt long")
        out = reconciliation_audit(
            parent, child, "k", F.col("total"), F.col("amt")).collect()[0]
        assert out.n_parents == 3
        assert out.n_children_only == 1      # key 4
        assert out.n_parents_only == 1       # key 3
        # mismatches: key2 off by 1, key3 off by 10, key4 off by 5
        assert out.n_mismatched == 3
        assert out.max_abs_diff == 10 and out.total_abs_diff == 16

    def test_tolerance(self, spark):
        from pyspark.sql import functions as F
        from notion_spark.pipeline.expectations import reconciliation_audit

        parent = spark.createDataFrame([(1, 100)], "k long, total long")
        child = spark.createDataFrame([(1, 99)], "k long, amt long")
        out = reconciliation_audit(
            parent, child, "k", F.col("total"), F.col("amt"),
            tolerance=1).collect()[0]
        assert out.n_mismatched == 0 and out.max_abs_diff == 1
