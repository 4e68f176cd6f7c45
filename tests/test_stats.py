"""Inferential/concentration statistics: exact-integer semantics vs
hand/Fraction references, tie + partitioning invariance, in-plan guards."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from notion_spark.pipeline import stats as S


def _halfup_micro(num: int, den: int) -> int:
    # the repo's contract: (2*num*1e6 + den) div (2*den) with Spark's
    # `div` ≡ DuckDB `//` on HUGEINT: TRUNCATING toward zero — floor for
    # positive numerators, ties toward zero for negative ones.
    q, d = 2 * num * 1_000_000 + den, 2 * den
    sign = -1 if (q < 0) != (d < 0) else 1
    return sign * (abs(q) // abs(d))


def _units(spark, n=50):
    rows = [(i, (i * 7) % 13 + 1, ["x", "y"][i % 2], ["p", "q", "r"][i % 3])
            for i in range(n)]
    return spark.createDataFrame(rows, "k int, v int, g string, h string")


# ---------------------------------------------------------------- global_ranked

def test_global_ranked_matches_sequential_scan(spark):
    df = _units(spark)
    got = {
        r.k: (r.rank, int(r.run_v))
        for r in S.global_ranked(df, ["v", "k"], sum_cols=["v"]).collect()
    }
    cum = 0
    for i, (v, k) in enumerate(sorted((r.v, r.k) for r in df.collect()), 1):
        cum += v
        assert got[k] == (i, cum)


def test_global_ranked_partition_invariant(spark):
    df = _units(spark, 37)
    a = S.global_ranked(df.repartition(1), ["v", "k"], ["v"], num_partitions=2)
    b = S.global_ranked(df.repartition(7), ["v", "k"], ["v"], num_partitions=6)
    ra = sorted((r.k, r.rank, int(r.run_v)) for r in a.collect())
    rb = sorted((r.k, r.rank, int(r.run_v)) for r in b.collect())
    assert ra == rb


def test_global_ranked_no_single_partition_data_window(spark):
    # the point of the operator: every window over the DATA is keyed by
    # the deterministic arithmetic bucket; only the <= n_buckets offset
    # frame may sort globally. r11: NO range sampler anywhere — a
    # sampled boundary under the broadcast offsets branch silently
    # misaligns ranks on an exchange-reuse miss.
    plan = (
        S.global_ranked(_units(spark), ["v", "k"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "__b" in plan  # windows are bucket-partitioned
    assert "rangepartitioning" not in plan


def test_global_ranked_correct_without_exchange_reuse(spark):
    # ADVICE r10 regression: with spark.sql.exchange.reuse=false the
    # r10 repartitionByRange form re-sampled boundaries in the offsets
    # subtree and corrupted 14851/20000 ranks. The arithmetic bucket is
    # a pure row function — ranks must be exact with reuse disabled.
    key = "spark.sql.exchange.reuse"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        df = _units(spark, 400).repartition(11)
        got = {
            r.k: (r.rank, int(r.run_v))
            for r in S.global_ranked(df, ["v", "k"], sum_cols=["v"]).collect()
        }
        cum = 0
        for i, (v, k) in enumerate(
            sorted((r.v, r.k) for r in df.collect()), 1
        ):
            cum += v
            assert got[k] == (i, cum)
    finally:
        spark.conf.set(key, prev)


def test_global_ranked_nulls_first(spark):
    # null first-key rows bucket to -1 and rank first (ASC NULLS FIRST)
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 5), (4, None), (5, 2)], "k int, v int"
    )
    got = sorted((r.k, r.rank) for r in S.global_ranked(df, ["v", "k"]).collect())
    assert got == [(1, 1), (2, 4), (3, 5), (4, 2), (5, 3)]


# ------------------------------------------------------------------------ gini

def test_gini_known_values(spark):
    even = spark.createDataFrame([(i, 5) for i in range(4)], "k int, v int")
    assert S.gini_coefficient(even, "v", "k").collect()[0].gini_micro == 0
    mono = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 8)], "k int, v int")
    r = S.gini_coefficient(mono, "v", "k").collect()[0]
    # (2*4*8 - 5*8) / (4*8) = 24/32 = 0.75
    assert r.gini_micro == 750_000 and r.n == 4 and r.total == 8


def test_gini_matches_fraction_reference(spark):
    df = _units(spark)
    r = S.gini_coefficient(df, "v", "k").collect()[0]
    xs = sorted(row.v for row in df.collect())
    n, sx = len(xs), sum(xs)
    srx = sum(i * x for i, x in enumerate(xs, 1))
    assert r.gini_micro == _halfup_micro(2 * srx - (n + 1) * sx, n * sx)


def test_gini_negative_raises(spark):
    bad = spark.createDataFrame([(1, -3), (2, 5)], "k int, v int")
    with pytest.raises(Exception, match="non-negative"):
        S.gini_coefficient(bad, "v", "k").collect()


# ------------------------------------------------------------------------- hhi

def test_hhi_known_values(spark):
    df = spark.createDataFrame(
        [("m", 1, 10), ("m", 2, 10), ("m", 3, 10), ("m", 4, 10),
         ("solo", 9, 42)],
        "grp string, member int, v int")
    got = {r.group: r for r in S.hhi_index(df, "grp", "v").collect()}
    assert got["solo"].hhi_micro == 1_000_000
    assert got["solo"].top_share_micro == 1_000_000
    assert got["m"].hhi_micro == 250_000  # even 4-way split -> 1/4
    assert got["m"].top_share_micro == 250_000
    assert got["m"].n_members == 4 and got["m"].total == 40


def test_hhi_zero_total_null(spark):
    df = spark.createDataFrame([("z", 1, 0), ("z", 2, 0)], "grp string, m int, v int")
    r = S.hhi_index(df, "grp", "v").collect()[0]
    assert r.hhi_micro is None and r.total == 0


# ---------------------------------------------------------- weighted_quantiles

def test_weighted_quantiles_hand_case(spark):
    # group g: values 1 (w 1), 2 (w 1), 10 (w 8) -> tot 10
    # q25: cum(1)=1, cum(2)=2, cum(10)=10; 1e6*cum >= q*tot
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 10, 8)], "grp string, v int, w int")
    got = {r.q_ppm: r.value
           for r in S.weighted_quantiles(df, "grp", "v", "w").collect()}
    assert got == {250_000: 10, 500_000: 10, 750_000: 10}
    df2 = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 4), ("g", 10, 1)], "grp string, v int, w int")
    got2 = {r.q_ppm: r.value
            for r in S.weighted_quantiles(df2, "grp", "v", "w").collect()}
    assert got2 == {250_000: 1, 500_000: 1, 750_000: 2}


def test_weighted_quantiles_matches_unweighted_median(spark):
    # all weights 1 -> lower median of the values
    df = _units(spark).withColumn("w", F.lit(1))
    got = {(r.group, r.q_ppm): r.value
           for r in S.weighted_quantiles(df, "g", "v", "w", (500_000,)).collect()}
    by_g: dict[str, list[int]] = {}
    for row in _units(spark).collect():
        by_g.setdefault(row.g, []).append(row.v)
    for g, xs in by_g.items():
        xs.sort()
        # smallest v with cum >= n/2 (lower weighted median)
        k = (len(xs) + 1) // 2
        assert got[(g, 500_000)] == xs[k - 1]


def test_weighted_quantiles_negative_weight_raises(spark):
    df = spark.createDataFrame([("g", 1, -1)], "grp string, v int, w int")
    with pytest.raises(Exception, match="monotone"):
        S.weighted_quantiles(df, "grp", "v", "w").collect()


# ------------------------------------------------------------------ chi-square

def test_chi_square_hand_case_with_zero_cell(spark):
    # 2x2: (a,p):3 (a,q):1 (b,p):0 (b,q):4 ; N=8, R_a=4 R_b=4 C_p=3 C_q=5
    rows = [("a", "p")] * 3 + [("a", "q")] + [("b", "q")] * 4
    df = spark.createDataFrame(rows, "x string, y string")
    got = {(r.a, r.b): r for r in S.chi_square_independence(df, "x", "y").collect()}
    assert set(got) == {("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")}
    assert got[("b", "p")].observed == 0
    n, ra, cp = 8, 4, 3
    e_bp = Fraction(ra * cp, n)  # 1.5
    assert got[("b", "p")].expected_micro == _halfup_micro(ra * cp, n)
    # contrib (0 - 1.5)^2 / 1.5 = 1.5
    assert got[("b", "p")].contrib_micro == _halfup_micro(
        (n * 0 - ra * cp) ** 2, n * ra * cp)
    assert all(r.dof == 1 for r in got.values())
    # full statistic vs Fraction reference
    obs = {("a", "p"): 3, ("a", "q"): 1, ("b", "p"): 0, ("b", "q"): 4}
    rm = {"a": 4, "b": 4}
    cm = {"p": 3, "q": 5}
    chi2 = sum(
        Fraction((n * o - rm[x] * cm[y]) ** 2, n * rm[x] * cm[y])
        for (x, y), o in obs.items()
    )
    got_chi2 = sum(r.contrib_micro for r in got.values())
    assert abs(got_chi2 - float(chi2) * 1e6) <= len(obs)  # half-up per cell


def test_chi_square_category_guard(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(40)], "x int, y int")
    with pytest.raises(Exception, match="categories"):
        S.chi_square_independence(df, "x", "y", max_categories=10).collect()


# ----------------------------------------------------------------------- welch

def test_welch_ttest_matches_pinned_sequence(spark):
    df = _units(spark)
    r = S.welch_ttest(df, "g", "v", "x", "y").collect()[0]
    xs = [row.v for row in df.collect() if row.g == "x"]
    ys = [row.v for row in df.collect() if row.g == "y"]
    na, nb = len(xs), len(ys)
    sa, sb = sum(xs), sum(ys)
    ssa, ssb = sum(v * v for v in xs), sum(v * v for v in ys)
    va, vb = na * ssa - sa * sa, nb * ssb - sb * sb
    sea = float(va) / (float(na) * float(na) * (float(na) - 1.0))
    seb = float(vb) / (float(nb) * float(nb) * (float(nb) - 1.0))
    t = (float(nb * sa - na * sb) / (float(na) * float(nb))) / math.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    assert r.n_a == na and r.n_b == nb
    assert r.mean_diff_micro == _halfup_micro(nb * sa - na * sb, na * nb)
    assert r.t == t  # identical IEEE sequence, not approx
    assert r.df_w == dfw
    # sanity: classic Welch via sample variances agrees to float tolerance
    s2a = va / (na * (na - 1))
    s2b = vb / (nb * (nb - 1))
    t_ref = (sum(xs) / na - sum(ys) / nb) / math.sqrt(s2a / na + s2b / nb)
    assert t == pytest.approx(t_ref, rel=1e-12)


def test_welch_ttest_degenerate_null(spark):
    df = spark.createDataFrame(
        [("x", 5), ("x", 5), ("y", 5), ("y", 5)], "g string, v int")
    r = S.welch_ttest(df, "g", "v", "x", "y").collect()[0]
    assert r.t is None and r.df_w is None and r.mean_diff_micro == 0


# ---------------------------------------------------------------- mann-whitney

def test_mann_whitney_matches_midrank_reference(spark):
    rows = [("a", v) for v in [1, 2, 2, 3, 5, 7, 7, 7, 9]] + [
        ("b", v) for v in [2, 4, 4, 6, 7, 8, 10, 10]
    ]
    df = spark.createDataFrame(rows, "g string, v int")
    r = S.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    vals = sorted(v for _, v in rows)
    rank: dict[int, float] = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2
        i = j
    na = sum(1 for g, _ in rows if g == "a")
    nb = len(rows) - na
    ra = sum(rank[v] for g, v in rows if g == "a")
    ua = ra - na * (na + 1) / 2
    assert r.u_a_x2 == int(2 * ua)
    assert r.u_a_x2 + r.u_b_x2 == 2 * r.n_a * r.n_b  # U_a + U_b == n_a*n_b
    from collections import Counter

    t = sum(c**3 - c for c in Counter(vals).values())
    assert r.tie_term == t
    n = na + nb
    var = (na * nb / 12.0) * ((n + 1.0) - t / (n * (n - 1.0)))
    z = (2 * ua - na * nb) / (2.0 * math.sqrt(var))
    assert r.z == z  # identical IEEE sequence


def test_mann_whitney_all_tied_null_z(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v int")
    r = S.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r.z is None
    assert r.u_a_x2 == r.u_b_x2 == 2 * 2 * 2 // 2  # U_a = U_b = n_a*n_b/2


def test_mann_whitney_partition_invariant(spark):
    rows = [("a", (i * 13) % 7) for i in range(40)] + [
        ("b", (i * 11) % 9) for i in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, v int")
    a = S.mann_whitney_u(df.repartition(1), "g", "v", "a", "b").collect()[0]
    b = S.mann_whitney_u(df.repartition(13), "g", "v", "a", "b",
                         num_partitions=5).collect()[0]
    assert a == b


# ------------------------------------------------------------------- exact auc

def test_auc_extremes_and_reference(spark):
    # perfect separation
    perfect = spark.createDataFrame(
        [(i, i, i >= 5) for i in range(10)], "k int, s int, y boolean")
    assert S.exact_auc(perfect, "s", "y").collect()[0].auc_micro == 1_000_000
    # anti-predictor
    anti = spark.createDataFrame(
        [(i, -i, i >= 5) for i in range(10)], "k int, s int, y boolean")
    assert S.exact_auc(anti, "s", "y").collect()[0].auc_micro == 0
    # constant score -> exactly 1/2 via midranks
    const = spark.createDataFrame(
        [(i, 7, i % 2 == 0) for i in range(10)], "k int, s int, y boolean")
    assert S.exact_auc(const, "s", "y").collect()[0].auc_micro == 500_000
    # tie-heavy reference
    rows = [(i, (i * 7) % 13, i % 3 == 0) for i in range(60)]
    df = spark.createDataFrame(rows, "k int, s int, y boolean")
    r = S.exact_auc(df, "s", "y").collect()[0]
    pos = [s for _, s, l in rows if l]
    neg = [s for _, s, l in rows if not l]
    wins2 = 2 * sum(1 for p in pos for n in neg if p > n) + sum(
        1 for p in pos for n in neg if p == n)
    assert r.auc_micro == _halfup_micro(wins2, 2 * len(pos) * len(neg))


def test_auc_single_class_null(spark):
    df = spark.createDataFrame([(1, 5, True), (2, 6, True)], "k int, s int, y boolean")
    r = S.exact_auc(df, "s", "y").collect()[0]
    assert r.auc_micro is None and r.n_neg == 0


# --------------------------------------------------------------------- ks test

def test_ks_identical_and_disjoint(spark):
    same = spark.createDataFrame(
        [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)],
        "g string, v int")
    r = S.ks_test(same, "g", "v", "a", "b").collect()[0]
    assert r.d_micro == 0
    disjoint = spark.createDataFrame(
        [("a", v) for v in (1, 2)] + [("b", v) for v in (10, 20)],
        "g string, v int")
    r2 = S.ks_test(disjoint, "g", "v", "a", "b").collect()[0]
    assert r2.d_micro == 1_000_000 and r2.ks_at_value == 2


def test_ks_matches_cdf_scan(spark):
    import bisect

    rows = [("a", (i * 13) % 29) for i in range(40)] + [
        ("b", (i * 11) % 23) for i in range(35)
    ]
    df = spark.createDataFrame(rows, "g string, v int")
    r = S.ks_test(df, "g", "v", "a", "b").collect()[0]
    a = sorted(v for g, v in rows if g == "a")
    b = sorted(v for g, v in rows if g == "b")
    best, at = -1, None
    for v in sorted(set(a + b)):
        d = abs(len(b) * bisect.bisect_right(a, v) - len(a) * bisect.bisect_right(b, v))
        if d > best:
            best, at = d, v
    assert r.d_micro == _halfup_micro(best, len(a) * len(b))
    assert r.ks_at_value == at


# -------------------------------------------------------------- rank_normalize

def test_rank_normalize_matches_bounded_variant(spark):
    from notion_spark.pipeline.curation import quantile_rank

    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(40)] + [(99, None)], "k int, v int")
    a = {r.k: r.v_qrank for r in S.rank_normalize(df, "v").collect()}
    b = {r.k: r.v_qrank for r in quantile_rank(df, "v").collect()}
    assert a == b  # identical semantics, scalable plan
    assert a[99] is None  # NULL ranks NULL


def test_rank_normalize_partition_invariant(spark):
    df = spark.createDataFrame([(i, (i * 11) % 23) for i in range(50)], "k int, v int")
    a = sorted((r.k, r.v_qrank) for r in
               S.rank_normalize(df.repartition(1), "v", num_partitions=2).collect())
    b = sorted((r.k, r.v_qrank) for r in
               S.rank_normalize(df.repartition(9), "v", num_partitions=7).collect())
    assert a == b


# -------------------------------------------------------------------- pareto

def test_pareto_hand_case(spark):
    df = spark.createDataFrame(
        list(enumerate([50, 30, 10, 5, 3, 2])), "k int, v int")
    out = {r.threshold_ppm: r for r in S.pareto_concentration(df, "v", "k").collect()}
    # total 100; desc cum 50, 80, 90, 95, 98, 100
    assert out[500_000].n_top_units == 1
    assert out[800_000].n_top_units == 2
    assert out[900_000].n_top_units == 3
    assert out[500_000].n_units == 6
    assert out[500_000].units_share_ppm == _halfup_micro(1, 6)


def test_pareto_uniform_and_ties(spark):
    df = spark.createDataFrame([(i, 10) for i in range(10)], "k int, v int")
    out = {r.threshold_ppm: r.n_top_units
           for r in S.pareto_concentration(df, "v", "k").collect()}
    assert out == {500_000: 5, 800_000: 8, 900_000: 9}


def test_pareto_negative_raises(spark):
    df = spark.createDataFrame([(1, -2)], "k int, v int")
    with pytest.raises(Exception, match="non-negative"):
        S.pareto_concentration(df, "v", "k").collect()


# ------------------------------------------------------------- goodness-of-fit

def test_gof_srm_hand_case(spark):
    rows = [("a",)] * 55 + [("b",)] * 40 + [("zz",)] * 5
    df = spark.createDataFrame(rows, "c string")
    out = {r.category: r
           for r in S.chi_square_goodness_of_fit(
               df, "c", {"a": 500_000, "b": 500_000}).collect()}
    # N=100, E=50 each: contrib_a = 25/50 = .5, contrib_b = 100/50 = 2
    assert out["a"].expected_micro == 50_000_000
    assert out["a"].contrib_micro == 500_000
    assert out["b"].contrib_micro == 2_000_000
    assert out["zz"].off_design and out["zz"].contrib_micro is None
    assert out["zz"].observed == 5
    assert all(r.dof == 1 for r in out.values())


def test_gof_validates_design(spark):
    df = spark.createDataFrame([("a",)], "c string")
    with pytest.raises(ValueError, match="sum to exactly"):
        S.chi_square_goodness_of_fit(df, "c", {"a": 400_000, "b": 500_000})
    with pytest.raises(ValueError, match="> 0"):
        S.chi_square_goodness_of_fit(df, "c", {"a": 1_000_000, "b": 0})


def test_gof_perfect_fit_zero(spark):
    rows = [("x",)] * 30 + [("y",)] * 70
    df = spark.createDataFrame(rows, "c string")
    out = {r.category: r.contrib_micro
           for r in S.chi_square_goodness_of_fit(
               df, "c", {"x": 300_000, "y": 700_000}).collect()}
    assert out == {"x": 0, "y": 0}


# ------------------------------------------------------------ r11 effect sizes

def _halfup_signed(num: int, den: int) -> int:
    return _halfup_micro(num, den)


class TestCliffsDelta:
    def _ev(self, spark, a_vals, b_vals):
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v long")

    def test_hand_case_with_ties(self, spark):
        # a = [1, 2, 2], b = [2, 3]: #(a>b)=0, #(a<b)=4, ties=2
        # delta = (0 - 4) / 6 = -2/3
        out = S.cliffs_delta(self._ev(spark, [1, 2, 2], [2, 3]), "g", "v",
                             "a", "b").collect()[0]
        assert out.n_a == 3 and out.n_b == 2
        assert out.delta_micro == _halfup_signed(-4, 6)
        assert out.magnitude == "large"

    def test_disjoint_and_identical(self, spark):
        hi = S.cliffs_delta(self._ev(spark, [10, 11], [1, 2]), "g", "v",
                            "a", "b").collect()[0]
        assert hi.delta_micro == 1_000_000 and hi.magnitude == "large"
        same = S.cliffs_delta(self._ev(spark, [5, 5], [5, 5]), "g", "v",
                              "a", "b").collect()[0]
        assert same.delta_micro == 0 and same.magnitude == "negligible"

    def test_matches_mwu_identity(self, spark):
        # delta == (u_a_x2 - n_a*n_b) / (n_a*n_b) from the MW-U output
        df = self._ev(spark, [3, 1, 4, 1, 5], [9, 2, 6])
        mwu = S.mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        d = S.cliffs_delta(df, "g", "v", "a", "b").collect()[0]
        assert d.delta_micro == _halfup_signed(
            mwu.u_a_x2 - mwu.n_a * mwu.n_b, mwu.n_a * mwu.n_b)


class TestSpearman:
    def test_perfect_monotone(self, spark):
        df = spark.createDataFrame(
            [(i, i * i) for i in range(1, 20)], "x long, y long")
        out = S.spearman_rho(df, "x", "y").collect()[0]
        assert out.n == 19 and out.rho_sign == 1
        assert abs(out.rho2 - 1.0) < 1e-12

    def test_perfect_inverse_and_ties(self, spark):
        df = spark.createDataFrame(
            [(1, 9), (2, 7), (3, 7), (4, 1)], "x long, y long")
        out = S.spearman_rho(df, "x", "y").collect()[0]
        assert out.rho_sign == -1
        # Fraction reference: midranks x=[1,2,3,4], y=[4, 2.5, 2.5, 1]
        from fractions import Fraction as Fr
        rx = [Fr(2), Fr(4), Fr(6), Fr(8)]       # doubled
        ry = [Fr(8), Fr(5), Fr(5), Fr(2)]
        n = 4
        num = n * sum(a * b for a, b in zip(rx, ry)) - sum(rx) * sum(ry)
        dx = n * sum(a * a for a in rx) - sum(rx) ** 2
        dy = n * sum(b * b for b in ry) - sum(ry) ** 2
        assert abs(out.rho2 - float(num * num / (dx * dy))) < 1e-12

    def test_constant_column_null(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 5)], "x long, y long")
        assert S.spearman_rho(df, "x", "y").collect()[0].rho2 is None


class TestCramersV:
    def test_perfect_association_2x2(self, spark):
        rows = [("p", "x")] * 5 + [("q", "y")] * 5
        df = spark.createDataFrame(rows, "a string, b string")
        out = S.cramers_v(df, "a", "b").collect()[0]
        # chi2 = N for a perfect 2x2 -> V^2 = N/(N*1) = 1
        assert out.n == 10 and out.r_categories == 2 and out.c_categories == 2
        assert out.v2_micro == 1_000_000

    def test_independent_uniform(self, spark):
        rows = [(a, b) for a in "pq" for b in "xy" for _ in range(5)]
        df = spark.createDataFrame(rows, "a string, b string")
        out = S.cramers_v(df, "a", "b").collect()[0]
        assert out.chi2_micro == 0 and out.v2_micro == 0

    def test_degenerate_margin_null(self, spark):
        df = spark.createDataFrame([("p", "x"), ("p", "y")], "a string, b string")
        assert S.cramers_v(df, "a", "b").collect()[0].v2_micro is None


class TestTwoProportion:
    def test_hand_case(self, spark):
        rows = ([("a", True)] * 30 + [("a", False)] * 70
                + [("b", True)] * 20 + [("b", False)] * 80)
        df = spark.createDataFrame(rows, "g string, s boolean")
        out = S.two_proportion_z(df, "g", "s", "a", "b").collect()[0]
        assert (out.n_a, out.x_a, out.n_b, out.x_b) == (100, 30, 100, 20)
        assert out.p_a_micro == 300_000 and out.p_b_micro == 200_000
        assert out.diff_micro == 100_000
        import math
        pool = 50 / 200
        se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
        assert abs(out.z - (0.3 - 0.2) / se) < 1e-12

    def test_null_successes_excluded_and_degenerate(self, spark):
        rows = [("a", True), ("a", None), ("b", True)]
        df = spark.createDataFrame(rows, "g string, s boolean")
        out = S.two_proportion_z(df, "g", "s", "a", "b").collect()[0]
        assert out.n_a == 1 and out.n_b == 1
        assert out.z is None  # pooled p = 1 -> se2 = 0


class TestEtaSquared:
    def test_perfect_separation(self, spark):
        # groups fully explain the variance -> eta2 ~ 1
        rows = [("a", 10)] * 5 + [("b", 20)] * 5
        df = spark.createDataFrame(rows, "g string, v long")
        out = S.eta_squared(df, "g", "v").collect()[0]
        assert out.n == 10 and out.k_groups == 2
        assert abs(out.eta2_micro - 1_000_000) <= 2  # micro rounding

    def test_no_effect(self, spark):
        # identical distributions per group -> eta2 ~ 0
        rows = [(g, v) for g in "ab" for v in (1, 2, 3, 4)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = S.eta_squared(df, "g", "v").collect()[0]
        assert out.eta2_micro <= 2  # clamped near zero

    def test_matches_fraction_reference(self, spark):
        from fractions import Fraction as Fr

        rows = [("a", 1), ("a", 3), ("b", 6), ("b", 8), ("b", 10)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = S.eta_squared(df, "g", "v").collect()[0]
        # micro-unit semantics reference: per-term half-up micro sums
        def hu(num, den):
            return (2 * num * 1_000_000 + den) // (2 * den)
        sb = hu(4 * 4, 2) + hu(24 * 24, 3)          # Σ S_g²/n_g micro
        grand = hu(28 * 28, 5)                       # S²/N micro
        ss_tot = (1 + 9 + 36 + 64 + 100) * 1_000_000 - grand
        want = hu(max(sb - grand, 0), ss_tot)
        assert out.eta2_micro == want

    def test_constant_values_null(self, spark):
        df = spark.createDataFrame([("a", 5), ("b", 5)], "g string, v long")
        assert S.eta_squared(df, "g", "v").collect()[0].eta2_micro is None
