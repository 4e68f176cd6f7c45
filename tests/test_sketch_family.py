"""Count-Min / KMV set ops / Bloom: planted-data semantics, the
guarantees each sketch sells (no underestimate, no false negative,
exactness below k), and mergeability as data."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_spark.pipeline.sketches import (
    bloom_bits,
    bloom_maybe_contains,
    cms_counters,
    cms_estimate,
    kmv_set_ops,
)


def _freq_df(spark):
    # value i appears i times, i in 1..20
    rows = [(f"v{i}",) for i in range(1, 21) for _ in range(i)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_wide_sketch_is_exact(spark):
    df = _freq_df(spark)
    exact = {r.k: r.c for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}

    narrow = cms_estimate(
        cms_counters(df, "k", depth=2, width=8), df, "k", depth=2, width=8
    )
    for r in narrow.collect():
        assert r.cms_est >= exact[r.value]  # CMS can only overestimate

    wide = cms_estimate(
        cms_counters(df, "k", depth=4, width=4096), df, "k", depth=4, width=4096
    )
    got = {r.value: r.cms_est for r in wide.collect()}
    assert got == exact  # collision-free width -> exact counts


def test_cms_counters_merge_as_data(spark):
    df = _freq_df(spark)
    half_a = df.limit(100)
    half_b = df.exceptAll(half_a)
    merged = (
        cms_counters(half_a, "k", depth=3, width=32)
        .unionByName(cms_counters(half_b, "k", depth=3, width=32))
        .groupBy("row", "w_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_counters(df, "k", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_kmv_set_ops_exact_below_k(spark):
    # |A| = 30, |B| = 20, |A ∩ B| = 10 -> union 40 < k: the sketch
    # minima ARE the full hash sets, every output is exact
    a = spark.createDataFrame([(f"x{i}",) for i in range(30)], "k string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 40)], "k string")
    row = kmv_set_ops(a, b, "k", k=256).collect()[0]
    assert row.n_union_minima == 40
    assert row.est_union == 40.0
    assert row.n_both == 10
    assert row.jaccard_est == 0.25
    assert row.est_intersection == 10.0


def test_kmv_set_ops_estimate_path_is_sane(spark):
    # 2000 distinct per side, 1000 shared -> estimates within 20%
    a = spark.createDataFrame([(f"a{i}",) for i in range(2000)], "k string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(1000)] + [(f"b{i}",) for i in range(1000)],
        "k string",
    )
    row = kmv_set_ops(a, b, "k", k=256).collect()[0]
    assert row.n_union_minima == 256  # estimate path, not exact
    assert 0.8 * 3000 <= row.est_union <= 1.2 * 3000
    assert 0.15 <= row.jaccard_est <= 0.55  # true j = 1000/3000
    assert 0.5 * 1000 <= row.est_intersection <= 1.6 * 1000


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
    cands = spark.createDataFrame(
        [(f"m{i}",) for i in range(50)] + [(f"n{i}",) for i in range(200)], "k string"
    )
    # tiny filter: false positives guaranteed, false negatives impossible
    bits = bloom_bits(members, "k", m_bits=256, k_hashes=2)
    res = {r.value: r.maybe_member for r in
           bloom_maybe_contains(cands, "k", bits, m_bits=256, k_hashes=2).collect()}
    assert all(res[f"m{i}"] for i in range(50))  # every member hits
    fps = [v for v in res if v.startswith("n") and res[v]]
    assert fps  # saturated filter must false-positive
    # hash-defined: the same build gives the same answer set
    res2 = {r.value: r.maybe_member for r in
            bloom_maybe_contains(cands, "k", bits, m_bits=256, k_hashes=2).collect()}
    assert res == res2


def test_histogram_quantiles_exact_on_dense_uniform(spark):
    from notion_spark.pipeline.sketches import histogram_quantiles

    # consecutive ints 1..1000: every bin is dense, so position
    # interpolation between the bin's true min/max recovers the EXACT
    # order statistic at every rank
    df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], "x double")
    rows = {(r.qnum, r.qden): r for r in
            histogram_quantiles(df, "x", scale=1).collect()}
    assert rows[(1, 2)].rank == 500 and rows[(1, 2)].est == 500.0
    assert rows[(1, 4)].rank == 250 and rows[(1, 4)].est == 250.0
    assert rows[(99, 100)].rank == 990 and rows[(99, 100)].est == 990.0
    ests = [rows[q].est for q in sorted(rows, key=lambda q: q[0] / q[1])]
    assert ests == sorted(ests)  # quantile estimates are monotone


def test_histogram_bins_merge_as_data(spark):
    from notion_spark.pipeline.sketches import histogram_bins

    df = spark.createDataFrame([(float(i % 37 + 1),) for i in range(500)], "x double")
    half_a, half_b = df.limit(250), df.exceptAll(df.limit(250))
    merged = (
        histogram_bins(half_a, "x").unionByName(histogram_bins(half_b, "x"))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"), F.min("vmin").alias("vmin"),
             F.max("vmax").alias("vmax"))
    )
    full = histogram_bins(df, "x")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_bloom_generous_sizing_has_no_fps_here(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(20)], "k string")
    cands = spark.createDataFrame([(f"n{i}",) for i in range(100)], "k string")
    bits = bloom_bits(members, "k", m_bits=1 << 16, k_hashes=4)
    res = bloom_maybe_contains(cands, "k", bits, m_bits=1 << 16, k_hashes=4)
    assert res.filter(F.col("maybe_member")).count() == 0


def test_histogram_drift_semantics(spark):
    from notion_spark.pipeline.sketches import histogram_bins, histogram_drift

    same = spark.createDataFrame([(float(i),) for i in range(1, 200)], "x double")
    row = histogram_drift(histogram_bins(same, "x"), histogram_bins(same, "x")).collect()[0]
    assert row.l1_micro == 0  # identical distributions -> zero drift
    assert row.n_a == row.n_b == 199

    # disjoint supports -> maximal drift (2e6 minus floor crumbs)
    lo = spark.createDataFrame([(float(i),) for i in range(1, 100)], "x double")
    hi = spark.createDataFrame([(float(i),) for i in range(10_000, 10_100)], "x double")
    far = histogram_drift(histogram_bins(lo, "x"), histogram_bins(hi, "x")).collect()[0]
    assert far.l1_micro > 1_990_000

    # drift is symmetric
    ab = histogram_drift(histogram_bins(lo, "x"), histogram_bins(same, "x")).collect()[0]
    ba = histogram_drift(histogram_bins(same, "x"), histogram_bins(lo, "x")).collect()[0]
    assert ab.l1_micro == ba.l1_micro > 0
