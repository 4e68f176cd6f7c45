

class TestTopKPerGroup:
    def test_hand_leaderboard(self, spark):
        from pyspark.sql import functions as F
        from notion_spark.operators.sorts import top_k_per_group

        rows = [("a", 1, 30), ("a", 2, 20), ("a", 3, 40), ("a", 4, 10),
                ("b", 5, 7)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        out = sorted((r.g, r.rank, r.id) for r in top_k_per_group(
            df, ["g"], [F.desc("v"), F.asc("id")], k=2).collect())
        assert out == [("a", 1, 3), ("a", 2, 1), ("b", 1, 5)]

    def test_tie_break_deterministic_and_k_validation(self, spark):
        import pytest
        from pyspark.sql import functions as F
        from notion_spark.operators.sorts import top_k_per_group

        rows = [("g", 2, 5), ("g", 1, 5)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        out = [(r.rank, r.id) for r in top_k_per_group(
            df, ["g"], [F.desc("v"), F.asc("id")], k=1).collect()]
        assert out == [(1, 1)]
        with pytest.raises(ValueError):
            top_k_per_group(df, ["g"], [F.desc("v")], k=0)
