"""Table profiler: planted-data semantics + the two-pass plan shape."""

from __future__ import annotations

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
