

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
