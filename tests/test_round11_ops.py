"""Known-answer tests for the round-11 one-way group-difference tests
and robust-location operators (operators/stats.py) plus the new
analytics query shapes."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_oneway_anova_f_known_answer(spark):
    from wellmeet_data_pipeline_spark.operators.stats import oneway_anova_f

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (7, 8, 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = oneway_anova_f(df, "g", F.col("v")).collect()[0]
    # means 2 and 8, grand 5: SSB = 3*(9+9) = 54, SSW = 2+2 = 4
    # F = (54/1)/(4/4) = 54, eta2 = 54/58
    assert out["n_all"] == 6 and out["n_groups"] == 2
    # the Q-fraction micro grid bounds the statistic's precision: the
    # tiny-SSW division amplifies the 5e-7 term snap into ~1e-5 relative
    assert abs(out["f_micro"] - 54_000_000) <= 5_000
    assert abs(out["eta2_micro"] - round(54 / 58 * 1e6)) <= 5


def test_oneway_anova_degenerate_single_group(spark):
    from wellmeet_data_pipeline_spark.operators.stats import oneway_anova_f

    df = spark.createDataFrame([("a", 1), ("a", 5)], "g string, v long")
    out = oneway_anova_f(df, "g", F.col("v")).collect()[0]
    assert out["f_micro"] is None  # k = 1: no between-group df


def test_levene_brown_forsythe_detects_spread_difference(spark):
    from wellmeet_data_pipeline_spark.operators.stats import levene_brown_forsythe

    # group a: tight around 100; group b: wide around 100 — means equal,
    # variances not; BF-W on |x - median_g| must be decisively positive
    rows = [("a", v) for v in (99, 100, 100, 101)] + [
        ("b", v) for v in (60, 90, 110, 140)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = levene_brown_forsythe(df, "g", F.col("v")).collect()[0]
    # z_a = |x-100| = [1,0,0,1]; z_b = |x-100| (lower median of b is 90)
    # -> z_b = [30,0,20,50]
    za, zb = [1, 0, 0, 1], [30, 0, 20, 50]
    n, k = 8, 2
    s_a, s_b = sum(za), sum(zb)
    q = sum(z * z for z in za + zb)
    ssb = s_a**2 / 4 + s_b**2 / 4 - (s_a + s_b) ** 2 / n
    sst = q - (s_a + s_b) ** 2 / n
    w = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert out["n_all"] == 8
    assert abs(out["f_micro"] / 1e6 - w) < 1e-3


def test_kruskal_wallis_known_answer_no_ties(spark):
    from wellmeet_data_pipeline_spark.operators.stats import kruskal_wallis_h

    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kruskal_wallis_h(df, "g", "v").collect()[0]
    # ranks 1,2 | 3,4: H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4, no ties
    assert out["n_all"] == 4 and out["n_groups"] == 2
    assert abs(out["h_micro"] - 2_400_000) <= 5


def test_kruskal_wallis_all_tied_is_null(spark):
    from wellmeet_data_pipeline_spark.operators.stats import kruskal_wallis_h

    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("b", 7), ("b", 7)], "g string, v long"
    )
    out = kruskal_wallis_h(df, "g", "v").collect()[0]
    assert out["h_micro"] is None  # tie correction degenerates to 0


def test_winsorized_mean_clamps_exactly(spark):
    from wellmeet_data_pipeline_spark.operators.stats import winsorized_mean_by_group

    rows = [("a", v) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = winsorized_mean_by_group(df, "g", F.col("v")).collect()[0]
    # cutoffs: rank ceil(5*20/100)=1 -> lo=1; rank ceil(95*20/100)=19 -> hi=19
    # clamped sum = sum(1..19) + 19 = 209 -> mean 10.45
    assert (out["lo_cents"], out["hi_cents"]) == (1, 19)
    assert out["wmean_micro"] == 10_450_000


def test_retention_and_funnel_shapes(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    ret = REGISTRY["user_retention_cohorts"].fn(spark, "/root/testdata/sf0.001")
    rows = ret.collect()
    assert rows, "cohorts must be non-empty on driver parquet"
    # offset 0 of each cohort is the cohort itself: full retention
    for r in rows:
        if r["week_offset"] == 0:
            assert r["n_active"] == r["n_cohort"]
            assert r["retention_micro"] == 1_000_000
        assert 0 <= r["retention_micro"] <= 1_000_000

    fun = {
        r["step"]: r
        for r in REGISTRY["event_funnel_conversion"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(fun) == {"view", "click", "purchase"}
    # the funnel is monotone by construction (each step re-filters)
    assert fun["view"]["n_users"] >= fun["click"]["n_users"] >= fun["purchase"]["n_users"]
    assert fun["view"]["conv_micro"] == 1_000_000


def test_rfm_segments_partition_customers(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY, table

    out = REGISTRY["customer_rfm_segments"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    segs = {(r["r_seg"], r["f_seg"], r["m_seg"]) for r in rows}
    assert all(1 <= s <= 5 for tri in segs for s in tri)
    n_cust = (
        table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust  # exact partition
