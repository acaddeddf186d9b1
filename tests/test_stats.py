"""DataFrameStatFunctions parity: exact-moment corr/cov, crosstab,
exact frequent items (Tier S, SURVEY §2.2)."""

from __future__ import annotations

import math

from cl_data_frame_spark.operators import stats as STAT


def test_moment_stats_match_numpy(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.0, 4.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    row = STAT.moment_stats(df, "x", "y").spark_df.collect()[0]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - 1)
    sx = math.sqrt(sum((a - mx) ** 2 for a in xs) / (n - 1))
    sy = math.sqrt(sum((b - my) ** 2 for b in ys) / (n - 1))
    corr = cov / (sx * sy)
    assert row["n"] == n
    assert abs(row["corr"] - corr) < 1e-6
    assert abs(row["cov_samp"] - cov) < 1e-6
    assert abs(row["std_x"] - sx) < 1e-6
    assert abs(row["std_y"] - sy) < 1e-6


def test_moment_stats_grouped_vs_spark_builtin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ours = {r["l_returnflag"]: r for r in
            STAT.moment_stats(li, "l_quantity", "l_extendedprice",
                              by=["l_returnflag"]).spark_df.collect()}
    for flag in ours:
        sub = li.filter(li.l_returnflag == flag)
        ref_corr = sub.stat.corr("l_quantity", "l_extendedprice")
        ref_cov = sub.stat.cov("l_quantity", "l_extendedprice")
        assert abs(ours[flag]["corr"] - ref_corr) < 1e-4
        assert abs(ours[flag]["cov_samp"] - ref_cov) < max(
            1e-4 * abs(ref_cov), 1e-4)


def test_crosstab_counts(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")], ["r", "c"])
    out = {row["r"]: row for row in
           STAT.crosstab(df, "r", "c", ["x", "y"]).spark_df.collect()}
    assert out["a"]["n_x"] == 2 and out["a"]["n_y"] == 1
    assert out["b"]["n_x"] == 0 and out["b"]["n_y"] == 1


def test_top_frequent_exact_with_ties(spark):
    rows = [("p",)] * 3 + [("q",)] * 3 + [("r",)] * 1
    df = spark.createDataFrame(rows, ["v"])
    got = [(r["v"], r["n"], r["rank"]) for r in
           STAT.top_frequent(df, "v", k=2).spark_df.collect()]
    # tie between p and q broken by value asc
    assert sorted(got, key=lambda t: t[2]) == [("p", 3, 1), ("q", 3, 2)]


def test_quantile_bins_equal_frequency(spark):
    from cl_data_frame_spark.operators.stats import quantile_bins
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    from pyspark.sql import functions as F
    out = quantile_bins(df, "v", n_bins=4).spark_df
    hist = {r["bin"]: r["n"] for r in
            out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert hist == {1: 25, 2: 25, 3: 25, 4: 25}


def test_quantile_bins_per_group_boundaries(spark):
    from cl_data_frame_spark.operators.stats import quantile_bins
    rows = [("a", float(v)) for v in range(1, 11)] + \
           [("b", float(v)) for v in range(100, 1100, 100)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_bins(df, "v", n_bins=2, by=["g"]).spark_df
    got = {(r["g"], r["v"]): r["bin"] for r in out.collect()}
    # group medians differ: 5.5 for a, 550 for b
    assert got[("a", 5.0)] == 1 and got[("a", 6.0)] == 2
    assert got[("b", 500.0)] == 1 and got[("b", 600.0)] == 2


def test_iqr_outliers_flags_extremes(spark):
    from cl_data_frame_spark.operators.stats import iqr_outliers
    vals = [float(v) for v in range(1, 21)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r["v"]: r["is_outlier"] for r in
           iqr_outliers(df, "v").spark_df.collect()}
    assert out[1000.0] is True
    assert all(out[v] is False for v in vals[:-1])


def test_iqr_outliers_per_group(spark):
    from cl_data_frame_spark.operators.stats import iqr_outliers
    rows = [("a", float(v)) for v in range(1, 21)] + [("a", 500.0)] + \
           [("b", float(v)) for v in range(1000, 1021)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["v"]): r["is_outlier"] for r in
           iqr_outliers(df, "v", by=["g"]).spark_df.collect()}
    assert out[("a", 500.0)] is True
    # 500 would NOT be an outlier under b's fences; group isolation
    assert out[("b", 1005.0)] is False


def test_fused_bins_outliers_matches_composition(spark):
    """quantile_bins_outliers (one shared percentile pass) must emit the
    identical per-row (bin, fences, flag) the two separate operators
    produce — joined on a unique synthetic key."""
    import random
    rng = random.Random(7)
    rows = [(i, "g" + str(i % 3),
             rng.gauss(100.0 * (i % 3 + 1), 30.0)) for i in range(900)]
    rows += [(1000 + j, "g0", 10_000.0 + j) for j in range(5)]  # outliers
    df = spark.createDataFrame(rows, "rid long, grp string, v double")
    fused = STAT.quantile_bins_outliers(
        df, "v", n_bins=4, by=["grp"]).spark_df
    binned = STAT.quantile_bins(df, "v", n_bins=4, by=["grp"]).spark_df
    flagged = STAT.iqr_outliers(df, "v", by=["grp"]).spark_df
    ref = (binned.select("rid", "bin")
           .join(flagged.select("rid", "fence_lo", "fence_hi",
                                "is_outlier"), on="rid"))
    got = sorted(tuple(r) for r in fused.select(
        "rid", "bin", "fence_lo", "fence_hi", "is_outlier").collect())
    want = sorted(tuple(r) for r in ref.collect())
    assert got == want
    assert any(r[4] for r in got)  # the planted outliers are flagged


def test_precomputed_cuts_and_quartiles_match(spark, sf_dir):
    """Passing an externally computed cut/quartile table must reproduce
    the internally aggregated result exactly."""
    from pyspark.sql import functions as F
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_returnflag",
                  "l_quantity"))
    shared = (li.groupBy("l_returnflag")
              .agg(F.percentile(
                  F.col("l_quantity"),
                  F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
                  .alias("__p__")))
    cuts = shared.select("l_returnflag", F.col("__p__").alias("__cuts__"))
    quart = shared.select(
        "l_returnflag",
        F.array(F.col("__p__")[0], F.col("__p__")[2]).alias("__q__"))
    a = sorted(tuple(r) for r in STAT.quantile_bins(
        li, "l_quantity", n_bins=4, by=["l_returnflag"],
        cuts=cuts).spark_df.collect())
    b = sorted(tuple(r) for r in STAT.quantile_bins(
        li, "l_quantity", n_bins=4,
        by=["l_returnflag"]).spark_df.collect())
    assert a == b
    c = sorted(tuple(r) for r in STAT.iqr_outliers(
        li, "l_quantity", by=["l_returnflag"],
        quartiles=quart).spark_df.collect())
    d = sorted(tuple(r) for r in STAT.iqr_outliers(
        li, "l_quantity", by=["l_returnflag"]).spark_df.collect())
    assert c == d


def test_moment_sums_reaggregation_is_exact(spark, sf_dir):
    """Per-group decimal moment sums rolled up with F.sum must equal the
    direct global sums (associativity of exact decimals) — the property
    the shared-pass corr_matrix derivation relies on."""
    from pyspark.sql import functions as F
    cols = ["l_quantity", "l_extendedprice"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per = STAT.moment_sums(li, cols, by=["l_returnflag"]).spark_df
    scols = [c for c in per.columns if c.startswith("s_")]
    rolled = per.groupBy().agg(
        F.sum("n").alias("n"),
        *[F.sum(c).alias(c) for c in scols]).collect()[0]
    direct = STAT.moment_sums(li, cols).spark_df.collect()[0]
    assert tuple(rolled) == tuple(direct)


def test_corr_matrix_matches_pairwise_moment_stats(spark, sf_dir):
    """Every (col_x, col_y) row of the one-pass matrix must equal the
    dedicated two-column moment_stats result for that pair."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    matrix = {(r["col_x"], r["col_y"]): (r["n"], r["corr"], r["cov_samp"])
              for r in STAT.corr_matrix(li, cols).spark_df.collect()}
    assert len(matrix) == 3
    for cx, cy in matrix:
        row = STAT.moment_stats(li, cx, cy).spark_df.collect()[0]
        assert matrix[(cx, cy)] == (row["n"], row["corr"], row["cov_samp"])


def test_grouped_regression_matches_closed_form(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [2.1, 4.2, 5.9, 8.1, 9.8, 12.2]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    row = STAT.grouped_regression(df, "x", "y").spark_df.collect()[0]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    sxx = sum((a - mx) ** 2 for a in xs)
    syy = sum((b - my) ** 2 for b in ys)
    slope = sxy / sxx
    intercept = my - slope * mx
    r2 = sxy * sxy / (sxx * syy)
    assert row["n"] == n
    assert abs(row["slope"] - slope) < 1e-6
    assert abs(row["intercept"] - intercept) < 1e-6
    assert abs(row["r2"] - r2) < 1e-6


def test_grouped_regression_from_shared_sums_identical(spark, sf_dir):
    """Deriving from a moment_sums table must be bit-identical to the
    self-aggregating path."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sums = STAT.moment_sums(li, cols, by=["l_returnflag"]).spark_df
    a = sorted(tuple(r) for r in STAT.grouped_regression(
        li, "l_quantity", "l_extendedprice",
        by=["l_returnflag"]).spark_df.collect())
    b = sorted(tuple(r) for r in STAT.grouped_regression(
        None, "l_quantity", "l_extendedprice", by=["l_returnflag"],
        sums=sums, cols=cols).spark_df.collect())
    assert a == b


def test_chisq_cells_independence_identity(spark):
    """For a table with perfectly independent margins every chi2_term is
    0 and expected equals observed."""
    rows = [("a", "x")] * 6 + [("a", "y")] * 2 + \
           [("b", "x")] * 3 + [("b", "y")] * 1
    df = spark.createDataFrame(rows, ["r", "c"])
    out = STAT.chisq_cells(df, "r", "c").spark_df.collect()
    assert len(out) == 4
    for row in out:
        assert row["chi2_term"] == 0.0
        assert abs(row["expected"] - row["n_obs"]) < 1e-9


def test_chisq_cells_statistic_matches_closed_form(spark):
    """2x2 chi-square statistic n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))."""
    a, b, c, d = 10, 20, 30, 5
    rows = ([("r1", "c1")] * a + [("r1", "c2")] * b
            + [("r2", "c1")] * c + [("r2", "c2")] * d)
    df = spark.createDataFrame(rows, ["r", "c"])
    out = STAT.chisq_cells(df, "r", "c").spark_df.collect()
    stat = sum(r["chi2_term"] for r in out)
    n = a + b + c + d
    expect = n * (a * d - b * c) ** 2 / \
        ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(stat - expect) < 1e-5


def test_mad_outliers_flags_extreme_value(spark):
    from cl_data_frame_spark.operators.stats import mad_outliers
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = mad_outliers(df, "x").spark_df.collect()
    flags = {r.x: r.is_mad_outlier for r in rows}
    assert flags[100.0] is True
    assert all(not flags[v] for v in vals[:-1])
    # median of the six values interpolates to 12.5
    assert rows[0].median == 12.5


def test_mad_outliers_grouped_and_constant_group(spark):
    from cl_data_frame_spark.operators.stats import mad_outliers
    rows = [("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 50.0),
            ("b", 5.0), ("b", 6.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = [(r.g, r.x, r.is_mad_outlier)
           for r in mad_outliers(df, "x", by=["g"]).spark_df.collect()]
    # group a: MAD = 0 (median 1.0) -> ANY deviation flags
    assert ("a", 50.0, True) in got
    assert ("a", 1.0, False) in got
    # group b is tight: nothing flags
    assert all(not f for (g, _, f) in got if g == "b")


def test_profile_table_one_pass_stats(spark):
    from cl_data_frame_spark.summary import profile_table
    rows = [(1, "x", 1.0), (2, "y", None), (2, None, 3.0)]
    df = spark.createDataFrame(rows, "k bigint, s string, v double")
    got = {r.column: r for r in profile_table(df).spark_df.collect()}
    assert got["k"].n_rows == 3 and got["k"].n_null == 0
    assert got["k"].n_distinct == 2
    assert got["k"].min_str == "1" and got["k"].max_str == "2"
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["s"].mean is None
    assert got["v"].n_null == 1 and got["v"].mean == 2.0


def test_global_avg_ranks_tie_averaged(spark):
    from cl_data_frame_spark.operators.stats import global_avg_ranks
    df = spark.createDataFrame([(10.0,), (20.0,), (20.0,), (30.0,)],
                               "x double")
    got = {r.x: (r.cnt, r.avg_rank)
           for r in global_avg_ranks(df, "x").spark_df.collect()}
    assert got[10.0] == (1, 1.0)
    assert got[20.0] == (2, 2.5)     # ranks 2 and 3 averaged
    assert got[30.0] == (1, 4.0)


def test_spearman_perfect_monotone_and_scipy_free_check(spark):
    from cl_data_frame_spark.operators.stats import spearman_corr
    # y = x^3 is monotone but nonlinear: Spearman = 1 exactly
    rows = [(float(x), float(x) ** 3) for x in range(1, 20)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, "x", "y").spark_df.collect()[0]
    assert r.n == 19 and r.rho == 1.0
    # reversing makes it -1
    rows2 = [(float(x), -float(x) ** 3) for x in range(1, 20)]
    df2 = spark.createDataFrame(rows2, "x double, y double")
    assert spearman_corr(df2, "x", "y").spark_df.collect()[0].rho == -1.0


def test_spearman_ties_match_pandas(spark):
    import pandas as pd
    from cl_data_frame_spark.operators.stats import spearman_corr
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = spearman_corr(df, "x", "y").spark_df.collect()[0].rho
    # pandas average ranks + Pearson == Spearman (no scipy in env)
    want = pd.Series(xs).rank().corr(pd.Series(ys).rank())
    assert abs(got - round(want, 6)) < 1e-6


def test_key_skew_report_uniform_vs_skewed(spark):
    from cl_data_frame_spark.operators.stats import key_skew_report
    uniform = spark.createDataFrame(
        [(k, i) for k in range(10) for i in range(5)], "k int, v int")
    r = key_skew_report(uniform, "k").spark_df.collect()[0]
    assert r.n_keys == 10 and r.n_rows == 50 and r.max_count == 5
    assert r.gini == 0.0 and r.cv == 0.0 and r.max_frac == 0.1
    # one hot key owning half the rows
    skewed = spark.createDataFrame(
        [(0, i) for i in range(50)] + [(k, 0) for k in range(1, 51)],
        "k int, v int")
    s = key_skew_report(skewed, "k").spark_df.collect()[0]
    assert s.n_keys == 51 and s.max_count == 50
    assert s.max_frac == 0.5
    assert s.gini > 0.4 and s.cv > 3.0


def test_profile_table_approximate_mode(spark):
    from cl_data_frame_spark.summary import profile_table
    rows = [(i, "s%d" % (i % 7)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k bigint, s string")
    got = {r.column: r
           for r in profile_table(df, approximate=True)
           .spark_df.collect()}
    # HLL++ default rsd 5%: wide tolerance on the big column, tight on
    # the 7-value one; everything else stays exact
    assert abs(got["k"].n_distinct - 1000) <= 100
    assert got["s"].n_distinct == 7
    assert got["k"].n_rows == 1000 and got["k"].n_null == 0
    assert got["k"].min_str == "0" and got["k"].max_str == "999"


def test_grouped_regression2_recovers_planted_coefficients(spark):
    from cl_data_frame_spark.operators.stats import grouped_regression2
    import random
    rng = random.Random(3)
    rows = []
    # exact plane y = 5 + 2*x1 - 3*x2 (no noise): R^2 = 1, coefficients
    # recovered exactly. Integer-valued features keep the data exactly
    # representable under the operator's DECIMAL(38,2) moment contract.
    for _ in range(200):
        x1, x2 = float(rng.randint(0, 40)), float(rng.randint(0, 40))
        rows.append(("g", x1, x2, 5.0 + 2.0 * x1 - 3.0 * x2))
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = grouped_regression2(df, "x1", "x2", "y",
                            by=["g"]).spark_df.collect()[0]
    assert abs(r.b0 - 5.0) < 1e-6
    assert abs(r.b1 - 2.0) < 1e-6
    assert abs(r.b2 + 3.0) < 1e-6
    assert abs(r.r2 - 1.0) < 1e-6


def test_grouped_regression2_collinear_is_null(spark):
    from cl_data_frame_spark.operators.stats import grouped_regression2
    rows = [("g", float(i), 2.0 * float(i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = grouped_regression2(df, "x1", "x2", "y",
                            by=["g"]).spark_df.collect()[0]
    assert r.b0 is None and r.b1 is None and r.b2 is None


def test_benford_digit_test_known_distribution(spark):
    import math
    from cl_data_frame_spark.operators.stats import benford_digit_test
    # values spanning magnitudes; digits computed arithmetically
    vals = [1.5, 12.0, 19.9, 200.0, 2.0e6, 0.003, 9.0, -5.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.digit: r for r in
           benford_digit_test(df, "x").spark_df.collect()}
    # -5 and 0 excluded -> 7 positive values
    assert sum(r.n_obs for r in got.values()) == 7
    assert got[1].n_obs == 3          # 1.5, 12.0, 19.9
    assert got[2].n_obs == 2          # 200.0, 2e6
    assert got[3].n_obs == 1          # 0.003
    assert got[9].n_obs == 1
    assert abs(got[1].exp_frac - round(math.log10(2), 6)) < 1e-9
    # chi2 term consistency for digit 1: (n - e)^2 / e, e = p*7
    e = math.log10(2) * 7
    assert abs(got[1].chi2_term - round((3 - e) ** 2 / e, 6)) < 1e-6


def test_benford_digit_clamped_at_float_log10_edges(spark):
    from cl_data_frame_spark.operators.stats import benford_digit_test
    # 9999999999999.99 as a double sits within 1 ULP below 10^13:
    # log10 rounds UP to 13 and the raw arithmetic digit would be 0
    # (element_at index-0 error); the edge mapping must classify both
    # near-power-of-10 doubles as true digit 9.
    vals = [9999999999999.99, 0.09999999999999999, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.digit: r.n_obs for r in
           benford_digit_test(df, "x").spark_df.collect()}
    assert sum(got.values()) == 3
    assert set(got) <= set(range(1, 10))
    assert got.get(9, 0) == 2 and got.get(1, 0) == 1


def test_sums_without_cols_raises(spark):
    import pytest
    from cl_data_frame_spark.operators.stats import (
        moment_sums, welch_t_test, grouped_regression2)
    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 3.0), ("a", 2.0, 1.0, 4.0),
         ("b", 3.0, 5.0, 6.0), ("b", 4.0, 2.0, 7.0)],
        "g string, x1 double, x2 double, y double")
    sums = moment_sums(df, ["x1", "x2", "y"], by=["g"])
    with pytest.raises(ValueError, match="cols is required"):
        welch_t_test(df, "x1", "g", sums=sums)
    with pytest.raises(ValueError, match="cols is required"):
        grouped_regression2(df, "x1", "x2", "y", by=["g"], sums=sums)


def test_welch_t_test_separated_vs_identical_groups(spark):
    from cl_data_frame_spark.operators.stats import welch_t_test
    rows = ([("a", float(v)) for v in range(1, 11)]           # mean 5.5
            + [("b", float(v)) for v in range(101, 111)]      # mean 105.5
            + [("c", float(v)) for v in range(1, 11)])        # == a
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r.g1, r.g2): r for r in
           welch_t_test(df, "x", "g").spark_df.collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    # equal n and variance: Welch df = n1 + n2 - 2 = 18; huge |t|
    assert abs(ab.welch_df - 18.0) < 1e-6
    assert ab.t_stat < -50 and ab.cohens_d < -30
    ac = got[("a", "c")]
    assert ac.t_stat == 0.0 and ac.cohens_d == 0.0


def test_spearman_approx_bounds_exact(spark):
    """The rank-bucket sketch sibling must land within O(1/buckets) of
    the exact rho on real data, and nail the perfect-monotone cases."""
    from cl_data_frame_spark.operators.stats import (spearman_corr,
                                                     spearman_corr_approx)
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    exact = spearman_corr(li, "l_quantity",
                          "l_extendedprice").spark_df.first()
    approx = spearman_corr_approx(li, "l_quantity", "l_extendedprice",
                                  buckets=128).spark_df.first()
    assert approx["n"] == exact["n"]
    assert abs(approx["rho"] - exact["rho"]) <= 0.02

    # perfect monotone (rho = 1) and anti-monotone (rho = -1)
    import math
    rows = [(float(i), math.exp(i / 50.0), -float(i) ** 3)
            for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    up = spearman_corr_approx(df, "x", "y", buckets=64).spark_df.first()
    dn = spearman_corr_approx(df, "x", "z", buckets=64).spark_df.first()
    assert up["rho"] >= 0.99
    assert dn["rho"] <= -0.99


def test_anova_oneway_matches_hand_computation(spark):
    from cl_data_frame_spark.operators.stats import anova_oneway
    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 3.0, 4.0, 5.0],
              "c": [10.0, 11.0, 12.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    got = anova_oneway(df, "x", "g").spark_df.first()
    all_v = [v for vs in groups.values() for v in vs]
    N, k = len(all_v), len(groups)
    grand = sum(all_v) / N
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2
              for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2
              for vs in groups.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert got["k"] == k and got["n"] == N
    assert abs(got["f_stat"] - f) < 1e-4
    assert abs(got["eta_sq"] - ssb / (ssb + ssw)) < 1e-6


def test_anova_from_shared_sums(spark):
    from cl_data_frame_spark.operators.stats import (anova_oneway,
                                                     moment_sums)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice"]
    sums = moment_sums(li, cols, by=["l_returnflag"])
    a = anova_oneway(li, "l_extendedprice", "l_returnflag").spark_df.first()
    b = anova_oneway(None, "l_extendedprice", "l_returnflag",
                     sums=sums, cols=cols).spark_df.first()
    assert a == b


def test_mann_whitney_u_with_ties(spark):
    from cl_data_frame_spark.operators.stats import mann_whitney_u
    g1 = [1.0, 2.0, 2.0, 5.0]
    g2 = [2.0, 3.0, 4.0]
    rows = [("a", v) for v in g1] + [("b", v) for v in g2]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r.g1, r.g2): r for r in
           mann_whitney_u(df, "x", "g").spark_df.collect()}
    r = got[("a", "b")]
    # U1 = sum over (x in a, y in b) of [y<x] + 0.5[y==x]
    u1 = sum((1.0 if y < x else 0.5 if y == x else 0.0)
             for x in g1 for y in g2)
    assert abs(r["u1"] - u1) < 1e-9
    n1, n2 = len(g1), len(g2)
    n = n1 + n2
    from collections import Counter
    tc = Counter(g1 + g2)
    ts = sum(t ** 3 - t for t in tc.values())
    var = n1 * n2 / 12.0 * ((n + 1) - ts / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / var ** 0.5
    assert abs(r["z"] - z) < 1e-6
    assert r["n1"] == n1 and r["n2"] == n2


def test_mann_whitney_u_separated_groups(spark):
    from cl_data_frame_spark.operators.stats import mann_whitney_u
    rows = ([("lo", float(v)) for v in range(10)]
            + [("hi", float(v)) for v in range(100, 110)])
    df = spark.createDataFrame(rows, "g string, x double")
    r = mann_whitney_u(df, "x", "g").spark_df.first()
    # 'hi' < 'lo' lexically -> g1=hi fully dominates: U1 = n1*n2
    assert r["g1"] == "hi" and r["u1"] == 100.0
    assert r["z"] > 3.5


def test_kendall_tau_b_matches_hand_computation(spark):
    from cl_data_frame_spark.operators.stats import kendall_tau_b
    import itertools
    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = kendall_tau_b(df, "x", "y").spark_df.first()
    C = D = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        s = (x1 - x2) * (y1 - y2)
        C += s > 0
        D += s < 0
    n = len(xs)
    n0 = n * (n - 1) / 2
    from collections import Counter
    n1 = sum(t * (t - 1) // 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(ys).values())
    tau = (C - D) / ((n0 - n1) * (n0 - n2)) ** 0.5
    assert got["n"] == n
    assert got["concordant"] == C and got["discordant"] == D
    assert abs(got["tau_b"] - tau) < 1e-6


def test_kendall_tau_b_perfect_orders(spark):
    from cl_data_frame_spark.operators.stats import kendall_tau_b
    rows = [(float(i), float(i * 2), float(-i)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    assert kendall_tau_b(df, "x", "y").spark_df.first()["tau_b"] == 1.0
    assert kendall_tau_b(df, "x", "z").spark_df.first()["tau_b"] == -1.0


def test_winsorize_clips_at_percentiles(spark):
    from cl_data_frame_spark.operators.stats import winsorize
    vals = [float(v) for v in range(1, 101)]          # 1..100
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r["v"]: r["v_wins"] for r in
           winsorize(df, "v", 0.10, 0.90).spark_df.collect()}
    # exact percentiles of 1..100: p10 = 10.9, p90 = 90.1
    assert out[1.0] == 10.9 and out[5.0] == 10.9
    assert abs(out[100.0] - 90.1) < 1e-9
    assert abs(out[95.0] - 90.1) < 1e-9
    assert out[50.0] == 50.0                          # interior untouched


def test_winsorize_per_group_isolation(spark):
    from cl_data_frame_spark.operators.stats import winsorize
    rows = [("a", float(v)) for v in range(1, 11)] + \
           [("b", float(v)) for v in range(1000, 1010)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["v"]): r["v_wins"] for r in
           winsorize(df, "v", 0.2, 0.8, by=["g"]).spark_df.collect()}
    assert out[("a", 1.0)] > 1.0 and out[("a", 1.0)] < 5.0
    assert out[("b", 1000.0)] > 1000.0   # b clips at ITS OWN bounds


def test_cramers_v_extremes(spark):
    from cl_data_frame_spark.operators.stats import cramers_v
    # perfect association: each row value maps to exactly one col value
    rows = [("a", "x")] * 5 + [("b", "y")] * 5 + [("c", "z")] * 5
    df = spark.createDataFrame(rows, "r string, c string")
    got = cramers_v(df, "r", "c").spark_df.first()
    assert got["cramers_v"] == 1.0 and got["r"] == 3 and got["c"] == 3
    # independence: identical col distribution in every row class
    rows2 = [(r, c) for r in "ab" for c in "xy" for _ in range(10)]
    df2 = spark.createDataFrame(rows2, "r string, c string")
    got2 = cramers_v(df2, "r", "c").spark_df.first()
    assert got2["chi2"] == 0.0 and got2["cramers_v"] == 0.0
    assert got2["n"] == 40


def test_auc_score_matches_pairwise_definition(spark):
    from cl_data_frame_spark.operators.stats import auc_score
    scores = [0.9, 0.8, 0.7, 0.6, 0.55, 0.5, 0.5, 0.3, 0.2, 0.1]
    labels = [1, 1, 0, 1, 0, 1, 0, 0, 1, 0]
    df = spark.createDataFrame(list(zip(scores, labels)),
                               "s double, y int")
    got = auc_score(df, "s", "y").spark_df.first()
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    u = sum((1.0 if sn < sp else 0.5 if sn == sp else 0.0)
            for sp in pos for sn in neg)
    want = u / (len(pos) * len(neg))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - want) < 1e-9


def test_auc_score_extremes(spark):
    from cl_data_frame_spark.operators.stats import auc_score
    rows = ([(float(i), 1) for i in range(50, 100)]
            + [(float(i), 0) for i in range(50)])
    df = spark.createDataFrame(rows, "s double, y int")
    assert auc_score(df, "s", "y").spark_df.first()["auc"] == 1.0
    flipped = df.selectExpr("s", "1 - y AS y")
    assert auc_score(flipped, "s", "y").spark_df.first()["auc"] == 0.0


def test_cohens_kappa_known_values(spark):
    from cl_data_frame_spark.operators.stats import cohens_kappa
    # classic textbook table: raters agree on 20+15 of 50
    rows = ([("yes", "yes")] * 20 + [("no", "no")] * 15
            + [("yes", "no")] * 10 + [("no", "yes")] * 5)
    df = spark.createDataFrame(rows, "a string, b string")
    got = cohens_kappa(df, "a", "b").spark_df.first()
    po = 35 / 50
    pe = (30 / 50) * (25 / 50) + (20 / 50) * (25 / 50)
    want = (po - pe) / (1 - pe)
    assert got["n"] == 50
    assert abs(got["p_obs"] - po) < 1e-9
    assert abs(got["p_exp"] - pe) < 1e-9
    assert abs(got["kappa"] - want) < 1e-6


def test_cohens_kappa_extremes(spark):
    from cl_data_frame_spark.operators.stats import cohens_kappa
    perfect = spark.createDataFrame(
        [(c, c) for c in "abcabcabc"], "a string, b string")
    assert cohens_kappa(perfect, "a", "b").spark_df.first()["kappa"] == 1.0
    # systematic disagreement -> negative kappa
    anti = spark.createDataFrame(
        [("x", "y")] * 10 + [("y", "x")] * 10, "a string, b string")
    assert cohens_kappa(anti, "a", "b").spark_df.first()["kappa"] < 0
    # degenerate: both constant and equal -> p_e = 1 -> NULL
    const = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    assert cohens_kappa(const, "a", "b").spark_df.first()["kappa"] is None


def test_target_encode_shrinks_rare_categories(spark):
    from cl_data_frame_spark.operators.stats import target_encode
    rows = ([("big", 10.0)] * 100        # well-estimated mean 10
            + [("rare", 100.0)])         # one sample, mean 100
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.c: r.c_enc for r in
           target_encode(df, "c", "y", smoothing=20.0)
           .spark_df.dropDuplicates(["c"]).collect()}
    gmean = (100 * 10.0 + 100.0) / 101
    want_big = (100 * 10.0 + 20 * gmean) / 120
    want_rare = (100.0 + 20 * gmean) / 21
    assert abs(out["big"] - want_big) < 1e-4
    assert abs(out["rare"] - want_rare) < 1e-4
    # shrinkage: the rare category sits FAR from its raw mean, near
    # the prior; the big one stays near its own mean
    assert out["rare"] < 30
    assert abs(out["big"] - 10.0) < 0.5


def test_target_encode_zero_smoothing_is_raw_mean(spark):
    from cl_data_frame_spark.operators.stats import target_encode
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.c: r.c_enc for r in
           target_encode(df, "c", "y", smoothing=0.0)
           .spark_df.dropDuplicates(["c"]).collect()}
    assert out["a"] == 2.0 and out["b"] == 10.0


def test_poisson_bootstrap_ci_covers_true_mean(spark):
    from cl_data_frame_spark.operators.stats import poisson_bootstrap_ci
    import random
    rng = random.Random(11)
    vals = [(i, rng.gauss(50.0, 10.0)) for i in range(2000)]
    df = spark.createDataFrame(vals, "rid bigint, x double")
    r = poisson_bootstrap_ci(df, "x", "rid",
                             n_replicates=60).spark_df.first()
    true_mean = sum(v for _, v in vals) / len(vals)
    assert r["n"] == 2000
    assert abs(r["mean"] - true_mean) < 1e-4
    assert r["lo"] <= true_mean <= r["hi"]
    # ~95% CI for n=2000, sd=10: half-width around 0.45 — sane bounds
    assert 0.1 < (r["hi"] - r["lo"]) < 2.5
    # deterministic across runs
    r2 = poisson_bootstrap_ci(df, "x", "rid",
                              n_replicates=60).spark_df.first()
    assert (r["lo"], r["hi"]) == (r2["lo"], r2["hi"])


def test_poisson_bootstrap_ci_width_shrinks_with_n(spark):
    from cl_data_frame_spark.operators.stats import poisson_bootstrap_ci
    import random
    rng = random.Random(3)
    small = [(i, rng.gauss(0, 1.0)) for i in range(200)]
    big = [(i, rng.gauss(0, 1.0)) for i in range(5000)]
    w = {}
    for name, rows in (("small", small), ("big", big)):
        df = spark.createDataFrame(rows, "rid bigint, x double")
        r = poisson_bootstrap_ci(df, "x", "rid",
                                 n_replicates=50).spark_df.first()
        w[name] = r["hi"] - r["lo"]
    assert w["big"] < w["small"] / 2


def test_poisson_bootstrap_ci_per_group(spark):
    from cl_data_frame_spark.operators.stats import poisson_bootstrap_ci
    import random
    rng = random.Random(5)
    rows = ([(i, "lo", rng.gauss(10.0, 1.0)) for i in range(800)]
            + [(i + 10000, "hi", rng.gauss(100.0, 1.0))
               for i in range(800)])
    df = spark.createDataFrame(rows, "rid bigint, g string, x double")
    out = {r["g"]: r for r in
           poisson_bootstrap_ci(df, "x", "rid", n_replicates=40,
                                by=["g"]).spark_df.collect()}
    assert out["lo"]["lo"] <= 10.0 <= out["lo"]["hi"]
    assert out["hi"]["lo"] <= 100.0 <= out["hi"]["hi"]
    assert out["lo"]["hi"] < 12 < 98 < out["hi"]["lo"]   # disjoint CIs


def test_poisson_bootstrap_ci_never_collects(spark, monkeypatch):
    """The replicate fold is a second Spark aggregation — building
    the grouped-CI frame must run NO driver collect (the #groups × R
    driver fold would OOM on a high-cardinality ``by``). Empty-input
    synthesis must be relational too."""
    from pyspark.sql import DataFrame
    from cl_data_frame_spark.operators.stats import poisson_bootstrap_ci

    def boom(self):
        raise AssertionError("driver collect() inside bootstrap build")
    monkeypatch.setattr(DataFrame, "collect", boom)
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "rid bigint, g string, x double")
    grouped = poisson_bootstrap_ci(df, "x", "rid", n_replicates=8,
                                   by=["g"])
    ungrouped = poisson_bootstrap_ci(df, "x", "rid", n_replicates=8)
    empty = poisson_bootstrap_ci(
        df.filter("x < 0"), "x", "rid", n_replicates=8)
    monkeypatch.undo()
    rows = {r["g"]: r for r in grouped.spark_df.collect()}
    assert set(rows) == {"a", "b"} and rows["a"]["n"] == 2
    assert ungrouped.spark_df.first()["n"] == 3
    er = empty.spark_df.collect()
    assert len(er) == 1 and er[0]["n"] == 0 and er[0]["mean"] is None


def test_psi_no_drift_is_near_zero(spark):
    from cl_data_frame_spark.operators.stats import \
        population_stability_index
    import random
    rng = random.Random(7)
    vals = [rng.gauss(0, 1) for _ in range(4000)]
    ref = spark.createDataFrame([(v,) for v in vals[:2000]], ["x"])
    cur = spark.createDataFrame([(v,) for v in vals[2000:]], ["x"])
    out = population_stability_index(ref, cur, "x").spark_df.collect()
    psi = sum(r.psi_term for r in out)
    assert psi < 0.05                       # same distribution
    assert len(out) == 10
    assert abs(sum(r.p_ref for r in out) - 1.0) < 0.01


def test_psi_detects_mean_shift_and_out_of_range(spark):
    from cl_data_frame_spark.operators.stats import \
        population_stability_index
    import random
    rng = random.Random(9)
    ref = spark.createDataFrame(
        [(rng.gauss(0, 1),) for _ in range(2000)], ["x"])
    cur = spark.createDataFrame(
        [(rng.gauss(3, 1),) for _ in range(2000)], ["x"])
    out = population_stability_index(ref, cur, "x").spark_df.collect()
    psi = sum(r.psi_term for r in out)
    assert psi > 0.25                       # investigate-level drift
    # mass concentrates in the reference's TOP bin (+ above its range)
    top = max(out, key=lambda r: r.bin)
    assert top.p_cur > 0.5


def test_winsorize_null_group_key_keeps_rows(spark):
    """ADVICE r6: by= must not drop NULL-keyed rows (keep-the-row
    contract) — they pass through unclipped."""
    from cl_data_frame_spark.operators.stats import winsorize
    rows = ([("a", float(v)) for v in range(1, 11)]
            + [(None, 500.0), (None, -500.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = winsorize(df, "v", 0.2, 0.8, by=["g"]).spark_df.collect()
    assert len(got) == 12                      # no row lost
    nulls = {r["v"]: r["v_wins"] for r in got if r["g"] is None}
    assert nulls == {500.0: 500.0, -500.0: -500.0}   # unclipped


def test_poisson_bootstrap_ci_edge_inputs(spark):
    """ADVICE r6: empty frame / all-NULL column must yield a NULL
    interval row, not crash; NULL values are excluded from n/mean."""
    from cl_data_frame_spark.operators.stats import poisson_bootstrap_ci
    empty = spark.createDataFrame([], "rid bigint, x double")
    r = poisson_bootstrap_ci(empty, "x", "rid",
                             n_replicates=10).spark_df.first()
    assert r["n"] == 0 and r["mean"] is None
    assert r["lo"] is None and r["hi"] is None
    # NULLs in col: excluded from the count and every replicate
    rows = [(1, 10.0), (2, 20.0), (3, None), (4, 30.0)]
    df = spark.createDataFrame(rows, "rid bigint, x double")
    r2 = poisson_bootstrap_ci(df, "x", "rid",
                              n_replicates=30).spark_df.first()
    assert r2["n"] == 3
    assert abs(r2["mean"] - 20.0) < 1e-9
    assert r2["lo"] is not None and 10.0 <= r2["lo"] <= r2["hi"] <= 30.0
    # per-group with one all-NULL group: NULL interval row for it
    grows = [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, None)]
    gdf = spark.createDataFrame(grows, "g string, rid bigint, x double")
    out = {r["g"]: r for r in
           poisson_bootstrap_ci(gdf, "x", "rid", n_replicates=10,
                                by=["g"]).spark_df.collect()}
    assert out["b"]["n"] == 0 and out["b"]["mean"] is None
    assert out["a"]["n"] == 2


def test_cardinality_guard_bounds_cells_and_tracks_exact(spark):
    """VERDICT r6 #1: continuous high-cardinality inputs auto-bucket
    instead of going cells-squared; the guarded statistic tracks the
    exact one; exact=True restores the unguarded path bit-for-bit."""
    from cl_data_frame_spark.operators.stats import (
        _cardinality_guard, kendall_tau_b, mann_whitney_u, auc_score)
    import random
    rng = random.Random(7)
    # continuous x with a clear monotone relation to y + noise
    rows = [(rng.random() * 1000.0,) for _ in range(4000)]
    rows = [(x, x * 0.5 + rng.gauss(0, 50.0)) for (x,) in rows]
    df = spark.createDataFrame(rows, "x double, y double")
    # the guard itself: bucketed column cardinality <= buckets, so the
    # cell self-join is bounded by bucketed-cells squared
    g = _cardinality_guard(df, ["x"], exact=False,
                           max_distinct=1000, buckets=64)
    n_distinct = g.select("x").distinct().count()
    assert n_distinct <= 64
    # tau: guarded vs exact within the O(1/buckets) regime
    t_exact = kendall_tau_b(df, "x", "y", exact=True).spark_df.first()
    t_guard = kendall_tau_b(df, "x", "y", max_distinct=1000,
                            buckets=64).spark_df.first()
    assert abs(t_guard["tau_b"] - t_exact["tau_b"]) < 0.05
    # below the threshold the guard is a no-op: identical result
    small = spark.createDataFrame(
        [(float(i % 20), float((i * 7) % 13)) for i in range(500)],
        "x double, y double")
    assert (kendall_tau_b(small, "x", "y").spark_df.first()
            == kendall_tau_b(small, "x", "y",
                             exact=True).spark_df.first())
    # U/AUC: continuous score, binary label
    srows = [(rng.gauss(1.0 if i % 2 else 0.0, 1.0), i % 2)
             for i in range(4000)]
    sdf = spark.createDataFrame(srows, "s double, y int")
    a_exact = auc_score(sdf, "s", "y", exact=True).spark_df.first()
    a_guard = auc_score(sdf, "s", "y", max_distinct=1000,
                        buckets=256).spark_df.first()
    assert abs(a_guard["auc"] - a_exact["auc"]) < 0.01
    u_exact = mann_whitney_u(sdf, "s", "y",
                             exact=True).spark_df.first()
    u_guard = mann_whitney_u(sdf, "s", "y", max_distinct=1000,
                             buckets=256).spark_df.first()
    assert abs(u_guard["z"] - u_exact["z"]) / abs(u_exact["z"]) < 0.05


def test_cardinality_guard_rejects_noncontinuous_high_card(spark):
    """A non-numeric column above the bound raises with guidance
    (hash-bucketing a categorical would change the statistic)."""
    from cl_data_frame_spark.operators.stats import cramers_v
    import pytest
    rows = [(f"id_{i}", "x" if i % 2 else "y") for i in range(3000)]
    df = spark.createDataFrame(rows, "r string, c string")
    with pytest.raises(ValueError, match="distinct"):
        cramers_v(df, "r", "c", max_distinct=1000)
    # exact=True opts back in
    got = cramers_v(df, "r", "c", max_distinct=1000,
                    exact=True).spark_df.first()
    assert got["n"] == 3000


def test_theil_sen_robust_to_outliers(spark):
    from cl_data_frame_spark.operators.stats import theil_sen
    rows = [(float(x), 2.0 * x + 1.0) for x in range(50)] \
        + [(10.0, 500.0), (20.0, -400.0)]   # gross outliers
    df = spark.createDataFrame(rows, "x double, y double")
    r = theil_sen(df, "x", "y", exact=True).spark_df.first()
    assert r["slope"] == 2.0 and r["intercept"] == 1.0
    assert r["n"] == 52
    # duplicate points weight the slope median correctly
    dup = spark.createDataFrame(
        [(0.0, 0.0)] * 10 + [(1.0, 3.0)] * 10 + [(2.0, 100.0)],
        "x double, y double")
    r2 = theil_sen(dup, "x", "y", exact=True).spark_df.first()
    assert r2["slope"] == 3.0          # 100 weight-3 pairs dominate
    # guard path on a continuous column still lands near the truth
    import random
    rng = random.Random(4)
    cont = [(rng.random() * 100.0,) for _ in range(3000)]
    cont = [(x, 1.5 * x + rng.gauss(0, 3.0)) for (x,) in cont]
    dfc = spark.createDataFrame(cont, "x double, y double")
    r3 = theil_sen(dfc, "x", "y", max_distinct=1000,
                   buckets=64).spark_df.first()
    # bucket-midpoint slope: accuracy bounded by bucket width
    assert abs(r3["slope"] - 1.5) < 0.15


def test_mahalanobis_catches_joint_outlier(spark):
    """A point whose coordinates are individually in-range but jointly
    impossible (against the correlation) gets a large d2; per-group
    matrices are independent; k not in (2,3) raises."""
    import random
    from cl_data_frame_spark.operators.stats import mahalanobis_distance
    rng = random.Random(2)
    rows = []
    for i in range(500):
        x = rng.gauss(0, 1.0)
        rows.append((i, "g1", x, 2.0 * x + rng.gauss(0, 0.3)))
    rows.append((999, "g1", 2.0, -4.0))     # joint outlier
    # second group: anti-correlated; the same point is NOT an outlier
    for i in range(500):
        x = rng.gauss(0, 1.0)
        rows.append((2000 + i, "g2", x, -2.0 * x + rng.gauss(0, 0.3)))
    rows.append((2999, "g2", 2.0, -4.0))
    df = spark.createDataFrame(rows, "id bigint, g string, "
                                     "x double, y double")
    out = {r.id: r for r in
           mahalanobis_distance(df, ["x", "y"],
                                by=["g"]).spark_df.collect()}
    assert out[999].is_outlier and out[999].d2 > 100
    assert not out[2999].is_outlier and out[2999].d2 < 9
    # 3-column closed form agrees with numpy within the decimal(38,2)
    # input-quantization tolerance
    import numpy as np
    rows3 = [(i, rng.gauss(0, 1), rng.gauss(5, 2), rng.gauss(-3, 1))
             for i in range(400)]
    df3 = spark.createDataFrame(rows3, "id bigint, a double, "
                                       "b double, c double")
    got = {r.id: r.d2 for r in
           mahalanobis_distance(df3, ["a", "b", "c"])
           .spark_df.collect()}
    arr = np.array([[round(a, 2), round(b, 2), round(c, 2)]
                    for _, a, b, c in rows3])
    mu = arr.mean(0)
    iv = np.linalg.inv(np.cov(arr.T))
    for i, a, b, c in rows3[:25]:
        v = np.array([round(a, 2), round(b, 2), round(c, 2)]) - mu
        assert abs(got[i] - float(v @ iv @ v)) < 0.05
    import pytest
    with pytest.raises(ValueError, match="2 or 3"):
        mahalanobis_distance(df3, ["a"])


def test_partial_correlation_removes_confounder(spark):
    import random
    from cl_data_frame_spark.operators.stats import partial_correlation
    rng = random.Random(3)
    rows = []
    for _ in range(2000):
        z = rng.gauss(0, 1)
        rows.append((z + rng.gauss(0, 0.3), z + rng.gauss(0, 0.3), z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_correlation(df, "x", "y", "z").spark_df.first()
    # x and y are strongly correlated only through z
    assert r["r_xy"] > 0.85
    assert abs(r["partial_r"]) < 0.1
    # direct relation survives controlling for an irrelevant z
    rows2 = [(x, 2.0 * x + rng.gauss(0, 0.2), rng.gauss(0, 1))
             for x in (rng.gauss(0, 1) for _ in range(2000))]
    df2 = spark.createDataFrame(rows2, "x double, y double, z double")
    r2 = partial_correlation(df2, "x", "y", "z").spark_df.first()
    assert r2["partial_r"] > 0.9


def test_mutual_information_extremes(spark):
    import math
    from cl_data_frame_spark.operators.stats import mutual_information
    # perfect dependence: MI = H = ln(2), NMI = 1
    dep = spark.createDataFrame([("a", "x")] * 50 + [("b", "y")] * 50,
                                "r string, c string")
    r = mutual_information(dep, "r", "c").spark_df.first()
    ln2 = round(math.log(2), 6)
    assert r["mi"] == ln2 and r["h_x"] == ln2 and r["nmi"] == 1.0
    # independence: MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "ab" for b in "xy" for _ in range(25)],
        "r string, c string")
    r2 = mutual_information(ind, "r", "c").spark_df.first()
    assert r2["mi"] == 0.0 and r2["nmi"] == 0.0
    # XOR-shaped dependence: zero Pearson-style signal, full MI
    xor = spark.createDataFrame(
        [(a, b, str((a == "1") ^ (b == "1")))
         for a in "01" for b in "01" for _ in range(25)],
        "a string, b string, x string")
    rx = mutual_information(xor, "a", "x").spark_df.first()
    assert rx["mi"] == 0.0                     # a alone says nothing
    # but (a,b) jointly determines x: concat the pair
    from pyspark.sql import functions as F
    rj = mutual_information(
        xor.withColumn("ab", F.concat("a", "b")), "ab", "x")\
        .spark_df.first()
    # MI = H(x) = ln2 (x fully determined); NMI = ln2/sqrt(2ln2*ln2)
    assert rj["mi"] == round(math.log(2), 6)
    assert abs(rj["nmi"] - 1 / math.sqrt(2)) < 1e-6


def test_weighted_percentile_rules(spark):
    from cl_data_frame_spark.operators.stats import weighted_percentile
    import pytest
    # values 1..4 with weights (1, 1, 1, 7): the mass sits at 4
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)], "v double, w double")
    r = weighted_percentile(df, "v", "w", [0.25, 0.5, 1.0]).spark_df.first()
    assert r["p25"] == 3.0          # cum 1,2,3,10; 0.25*10=2.5 -> v=3
    assert r["p50"] == 4.0
    assert r["p100"] == 4.0
    # uniform weights degenerate to the lower quantile of the values
    u = spark.createDataFrame([(float(v), 1.0) for v in range(1, 11)],
                              "v double, w double")
    ru = weighted_percentile(u, "v", "w", [0.5]).spark_df.first()
    assert ru["p50"] == 5.0
    # per-group isolation + NULL exclusion
    g = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 100.0, 9.0), ("b", 5.0, 1.0),
         ("b", None, 99.0), ("b", 6.0, None)],
        "g string, v double, w double")
    got = {r["g"]: r for r in
           weighted_percentile(g, "v", "w", [0.5],
                               by=["g"]).spark_df.collect()}
    assert got["a"]["p50"] == 100.0 and got["a"]["n"] == 2
    assert got["b"]["p50"] == 5.0 and got["b"]["n"] == 1
    with pytest.raises(ValueError, match="probs"):
        weighted_percentile(df, "v", "w", [0.0])


def test_weighted_percentile_unkeyed_matches_sequential(spark):
    """The bucketed two-pass global path (by=None) must reproduce the
    sequential lower weighted-quantile rule exactly — including
    boundary ties that straddle approx-percentile cuts."""
    import random
    from cl_data_frame_spark.operators.stats import weighted_percentile
    rng = random.Random(8)
    # low-cardinality values -> repeated cuts + heavy boundary ties
    rows = [(float(rng.randint(1, 20)), float(rng.randint(1, 5)))
            for _ in range(5000)]
    probs = [0.1, 0.25, 0.5, 0.9, 1.0]

    def sequential(rows, p):
        srt = sorted(rows)
        tot = sum(w for _v, w in srt)
        cum = 0.0
        for v, w in srt:
            cum += w
            if cum >= p * tot:
                return v
        return srt[-1][0]

    df = spark.createDataFrame(rows, "v double, w double").repartition(8)
    got = weighted_percentile(df, "v", "w", probs).spark_df.first()
    assert got["n"] == 5000
    for p in probs:
        assert got[f"p{int(round(p * 100))}"] == sequential(rows, p), p


def test_weighted_percentile_unkeyed_no_global_window(spark):
    """by=None must NOT plan a single-partition global window: the
    cumulative window is partitioned by the equi-depth bucket, and the
    only SinglePartition exchange allowed is the final global
    aggregate's merge of per-partition partial rows."""
    from cl_data_frame_spark.operators.stats import weighted_percentile
    df = spark.range(0, 10_000).selectExpr(
        "cast(id % 997 as double) AS v", "cast(1 + id % 7 as double) AS w")
    out = weighted_percentile(df, "v", "w", [0.5, 0.9]).spark_df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bkt__" in plan
    # <=4 SinglePartition exchanges, none data-sized: the approx-
    # percentile cut aggregate's merge of per-partition partial
    # sketches (appears once per plan branch — main rows + bucket
    # totals), the <=64-row bucket carry table's window (r15: the
    # carry offsets are computed lazily in-plan instead of collected
    # to the driver — the global_avg_ranks recipe), and the final
    # global aggregate's merge of per-partition partial rows
    assert plan.count("Exchange SinglePartition") <= 4


def test_feature_scalers(spark):
    """standardize / minmax_scale / robust_scale: grouped and global,
    known values, NULL on degenerate (zero-variance / constant /
    zero-IQR) groups."""
    from cl_data_frame_spark.operators.stats import (
        minmax_scale, robust_scale, standardize)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
         ("b", 7.0), ("b", 7.0), ("b", 7.0)],
        "g string, x double")
    z = {(r.g, r.x): r.x_z for r in
         standardize(df, "x", by=["g"]).spark_df.collect()}
    # group a: mean 3, sample std sqrt(2.5)
    import math
    assert abs(z[("a", 5.0)] - round(2 / math.sqrt(2.5), 6)) < 1e-9
    assert abs(z[("a", 3.0)]) < 1e-9
    assert z[("b", 7.0)] is None            # zero variance -> NULL
    mm = {(r.g, r.x): r.x_mm for r in
          minmax_scale(df, "x", by=["g"]).spark_df.collect()}
    assert mm[("a", 1.0)] == 0.0 and mm[("a", 5.0)] == 1.0
    assert mm[("a", 3.0)] == 0.5
    assert mm[("b", 7.0)] is None           # constant -> NULL
    rb = {(r.g, r.x): r.x_rb for r in
          robust_scale(df, "x", by=["g"]).spark_df.collect()}
    # group a: median 3, IQR = 4 - 2 = 2
    assert rb[("a", 3.0)] == 0.0 and rb[("a", 5.0)] == 1.0
    assert rb[("a", 1.0)] == -1.0
    assert rb[("b", 7.0)] is None           # zero IQR -> NULL
    # ungrouped path (scalar broadcast crossJoin)
    g = standardize(df.filter("g = 'a'"), "x").spark_df.collect()
    assert abs({r.x: r.x_z for r in g}[3.0]) < 1e-9
    # population std (ddof=0)
    z0 = {r.x: r.x_z for r in
          standardize(df.filter("g = 'a'"), "x", ddof=0)
          .spark_df.collect()}
    assert abs(z0[5.0] - round(2 / math.sqrt(2.0), 6)) < 1e-9


def test_feature_scalers_never_collect(spark, monkeypatch):
    from pyspark.sql import DataFrame
    from cl_data_frame_spark.operators.stats import (
        minmax_scale, robust_scale, standardize)
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)],
                               "g string, x double")

    def boom(self):
        raise AssertionError("collect() inside scaler build")
    monkeypatch.setattr(DataFrame, "collect", boom)
    frames = [standardize(df, "x", by=["g"]),
              minmax_scale(df, "x", by=["g"]),
              robust_scale(df, "x", by=["g"])]
    monkeypatch.undo()
    for fr in frames:
        assert fr.spark_df.count() == 2
