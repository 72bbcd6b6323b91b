"""Behavioral pins for operators/stats.py — known-answer tests and
statistical properties the oracle parity gate can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_ks_known_answer_and_bounds(spark):
    """Two disjoint distributions → KS = 1; identical → KS = 0; the
    reported argmax value is the boundary of the disjoint supports."""
    from wellmeet_data_pipeline_spark.operators.stats import ks_drift_by_group

    rows = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in ks_drift_by_group(df, "g", "v").collect()}
    assert out["a"]["ks_micro"] == 1_000_000
    assert out["b"]["ks_micro"] == 1_000_000
    # sup first attained at a's largest value (F_a jumps to 1, F_b still 0)
    assert out["a"]["ks_at_value"] == 4

    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df2 = spark.createDataFrame(same, "g string, v long")
    for r in ks_drift_by_group(df2, "g", "v").collect():
        assert r["ks_micro"] == 0


def test_ks_hand_computed(spark):
    """a = {1,2}, rest = {2,3}: ECDF_a = [.5, 1, 1], ECDF_r = [0, .5, 1]
    at grid 1,2,3 → sup = 0.5."""
    from wellmeet_data_pipeline_spark.operators.stats import ks_drift_by_group

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2), ("b", 3)], "g string, v long"
    )
    out = {r["g"]: r["ks_micro"] for r in ks_drift_by_group(df, "g", "v").collect()}
    assert out["a"] == 500_000 and out["b"] == 500_000


def test_mann_whitney_exact_u_and_direction(spark):
    """Group strictly above the rest: U = n_g * n_r (all wins), z > 0;
    strictly below: U = 0, z < 0.  Doubled-rank ties keep u2 integer."""
    from wellmeet_data_pipeline_spark.operators.stats import mann_whitney_by_group

    rows = [("hi", v) for v in (10, 11, 12)] + [("lo", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in mann_whitney_by_group(df, "g", "v").collect()}
    assert out["hi"]["u2"] == 2 * 3 * 3 and out["hi"]["z_micro"] > 0
    assert out["lo"]["u2"] == 0 and out["lo"]["z_micro"] < 0

    # all-ties: U = n_g*n_r/2 exactly, z = NULL (zero variance)
    ties = [("a", 5)] * 3 + [("b", 5)] * 3
    df2 = spark.createDataFrame(ties, "g string, v long")
    for r in mann_whitney_by_group(df2, "g", "v").collect():
        assert r["u2"] == 9  # 2U = n_g*n_r
        assert r["z_micro"] is None


def test_welch_hand_computed(spark):
    """Hand-checked Welch t on two small samples (integer grid)."""
    from wellmeet_data_pipeline_spark.operators.stats import welch_t_pairs

    a, b = [10, 12, 14], [20, 24, 28]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_t_pairs(df, "g", F.col("v")).collect()[0]
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    se2 = va / 3 + vb / 3
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / ((va / 3) ** 2 / 2 + (vb / 3) ** 2 / 2)
    assert r["group_a"] == "a" and r["group_b"] == "b"
    assert r["t_micro"] == math.floor(t * 1e6 + 0.5)
    assert r["df_micro"] == math.floor(dof * 1e6 + 0.5)
    assert r["mean_diff_micro"] == math.floor((ma - mb) * 1e6 + 0.5)


def test_welch_symmetric_groups_t_zero(spark):
    from wellmeet_data_pipeline_spark.operators.stats import welch_t_pairs

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_t_pairs(df, "g", F.col("v")).collect()[0]
    assert r["t_micro"] == 0 and r["mean_diff_micro"] == 0
    assert r["df_micro"] == 4_000_000  # equal n, equal var → df = n1+n2-2


def test_conformal_coverage_guarantee(spark):
    """On an iid integer stream the split-conformal interval at 90%
    must cover >= ~90% of the held-out half (finite-sample guarantee
    holds in expectation; this fixture is deterministic and dense, so
    the realized coverage lands at or above the target index)."""
    from wellmeet_data_pipeline_spark.operators.stats import conformal_coverage

    rows = [("g", i, (i * 37) % 100) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    r = conformal_coverage(df, "g", F.col("v"), "id", q_pct=90).collect()[0]
    assert r["n_cal"] == 200 and r["n_test"] == 200
    assert r["cov_micro"] >= 880_000
    # quantile index: k = min(ceil(0.9 * 201), 200) = 181st smallest
    sc = sorted(abs(((i * 37) % 100) - r["pred_cents"]) for i in range(0, 400, 2))
    assert r["q_cents"] == sc[180]


def test_grouped_regression_exact_line(spark):
    """y = 3x + 7 exactly → slope 3.0, intercept 7.0, r2 = 1."""
    from wellmeet_data_pipeline_spark.operators.stats import grouped_regression

    rows = [("g", x, 3 * x + 7) for x in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = grouped_regression(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert r["slope_micro"] == 3_000_000
    assert r["intercept_micro"] == 7_000_000
    assert r["r2_micro"] == 1_000_000

    # zero x-variance → NULLs, not a divide error
    flat = spark.createDataFrame([("g", 5, y) for y in (1, 2, 3)], "g string, x long, y long")
    r2 = grouped_regression(flat, "g", F.col("x"), F.col("y")).collect()[0]
    assert r2["slope_micro"] is None and r2["r2_micro"] is None


def test_cusum_finds_planted_shift(spark):
    """Mean 10 for days 1-10, mean 50 for days 11-20: the CUSUM argmax
    lands exactly on the last pre-shift day."""
    from wellmeet_data_pipeline_spark.operators.stats import cusum_changepoint

    rows = [("g", f"2024-01-{d:02d}", 10 if d <= 10 else 50) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, day string, v long")
    r = cusum_changepoint(df, "g", "day", F.col("v")).collect()[0]
    assert r["cp_period"] == "2024-01-10"
    assert r["n_periods"] == 20 and r["total"] == 100 + 500
    # dev at k=10: |20*100 - 10*600| = 4000
    assert r["dev_max"] == 4000


def test_cusum_tie_resolves_earliest(spark):
    from wellmeet_data_pipeline_spark.operators.stats import cusum_changepoint

    # symmetric bump: dev ties at the two flanks; earliest day wins
    rows = [("g", "2024-01-01", 0), ("g", "2024-01-02", 10), ("g", "2024-01-03", 0)]
    df = spark.createDataFrame(rows, "g string, day string, v long")
    r = cusum_changepoint(df, "g", "day", F.col("v")).collect()[0]
    assert r["cp_period"] == "2024-01-01"


def test_null_domains_excluded(spark):
    """NULL group/value/period rows vanish from KS, MWU, and CUSUM."""
    from wellmeet_data_pipeline_spark.operators.stats import (
        cusum_changepoint,
        ks_drift_by_group,
        mann_whitney_by_group,
    )

    rows = [("a", 1), ("a", None), (None, 2), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    ks = ks_drift_by_group(df, "g", "v").collect()
    assert {r["g"] for r in ks} == {"a", "b"}
    assert {r["n_group"] for r in ks} == {1, 2}
    mw = mann_whitney_by_group(df, "g", "v").collect()
    assert {r["g"] for r in mw} == {"a", "b"}

    c_rows = [("a", "2024-01-01", 1), ("a", None, 9), (None, "2024-01-02", 1)]
    cdf = spark.createDataFrame(c_rows, "g string, day string, v long")
    cu = cusum_changepoint(cdf, "g", "day", F.col("v")).collect()
    assert len(cu) == 1 and cu[0]["g"] == "a" and cu[0]["n_periods"] == 1


def test_spearman_known_answers(spark):
    from wellmeet_data_pipeline_spark.operators.stats import spearman_rho

    # perfect monotone (nonlinear) relation -> rho = 1
    rows = [(x, x * x * x) for x in range(1, 15)]
    df = spark.createDataFrame(rows, "a long, b long")
    assert spearman_rho(df, "a", "b").collect()[0]["rho_micro"] == 1_000_000

    # perfect anti-monotone -> rho = -1
    rows2 = [(x, 100 - x) for x in range(1, 15)]
    df2 = spark.createDataFrame(rows2, "a long, b long")
    assert spearman_rho(df2, "a", "b").collect()[0]["rho_micro"] == -1_000_000

    # constant column -> NULL (zero rank variance), not a divide error
    df3 = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], "a long, b long")
    assert spearman_rho(df3, "a", "b").collect()[0]["rho_micro"] is None


def test_spearman_ties_average_rank(spark):
    """x = (1,2,2,3) vs y = (1,2,3,4): classic tie case; rho =
    Pearson on average ranks = 0.9428090... -> 942809 on the grid."""
    from wellmeet_data_pipeline_spark.operators.stats import spearman_rho

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (3, 4)], "a long, b long"
    )
    got = spearman_rho(df, "a", "b").collect()[0]["rho_micro"]
    import math

    # ranks of a: 1, 2.5, 2.5, 4; ranks of b: 1,2,3,4
    ra, rb = [1, 2.5, 2.5, 4], [1, 2, 3, 4]
    n = 4
    sa, sb = sum(ra), sum(rb)
    num = n * sum(x * y for x, y in zip(ra, rb)) - sa * sb
    den = math.sqrt(
        (n * sum(x * x for x in ra) - sa * sa) * (n * sum(y * y for y in rb) - sb * sb)
    )
    assert got == math.floor(num / den * 1e6 + 0.5)


def test_gini_known_answers(spark):
    from wellmeet_data_pipeline_spark.operators.stats import gini_by_group

    # perfect equality -> 0
    eq = spark.createDataFrame([("g", i, 10) for i in range(5)], "g string, id long, x long")
    assert gini_by_group(eq, "g", "id", F.col("x")).collect()[0]["gini_micro"] == 0

    # one member owns everything among n=4 -> G = (n-1)/n = 0.75
    mono = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 0), ("g", 3, 0), ("g", 4, 100)],
        "g string, id long, x long",
    )
    assert gini_by_group(mono, "g", "id", F.col("x")).collect()[0]["gini_micro"] == 750_000

    # all-zero group -> NULL, not divide error
    z = spark.createDataFrame([("g", 1, 0), ("g", 2, 0)], "g string, id long, x long")
    assert gini_by_group(z, "g", "id", F.col("x")).collect()[0]["gini_micro"] is None


def test_entropy_known_answers(spark):
    import math

    from wellmeet_data_pipeline_spark.operators.stats import shannon_entropy_by_group

    rows = (
        [("u1", "a")] * 4
        + [("u2", t) for t in ("a", "b", "c", "d")]
        + [("u3", "a"), ("u3", "a"), ("u3", "b")]
    )
    df = spark.createDataFrame(rows, "g string, t string")
    out = {r["g"]: r for r in shannon_entropy_by_group(df, "g", "t").collect()}
    assert out["u1"]["entropy_nats"] == 0.0 and out["u1"]["n_items"] == 1
    assert abs(out["u2"]["entropy_nats"] - math.log(4)) < 1e-6
    h3 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert abs(out["u3"]["entropy_nats"] - h3) < 1e-6


def test_bloom_plan_formula(spark):
    import math

    from wellmeet_data_pipeline_spark.operators.stats import bloom_parameter_plan

    rows = [("t", i) for i in range(1000)] + [("s", 0)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in bloom_parameter_plan(df, "g", "k").collect()}
    n = 1000
    m = math.ceil(n * 4.605170185988091 / (0.6931471805599453**2))
    k = max(1, math.floor(m / n * 0.6931471805599453 + 0.5))
    assert out["t"]["n_keys"] == n and out["t"]["m_bits"] == m
    assert out["t"]["k_hashes"] == k
    # realized fpp should sit near the 1% target
    assert 8_000 <= out["t"]["fpp_micro"] <= 11_000
    # single-key group: k clamps to >= 1 and the plan stays finite
    assert out["s"]["n_keys"] == 1 and out["s"]["k_hashes"] >= 1


def test_quantile_normalize_known_answer(spark):
    """Two equal-size groups with shifted values: after normalization
    both groups carry the SAME multiset (the pooled quantile values),
    and within-group order is preserved."""
    from wellmeet_data_pipeline_spark.operators.stats import (
        quantile_normalize_by_group,
    )

    rows = [("a", i, v) for i, v in enumerate([10, 20, 30, 40])] + [
        ("b", 10 + i, v) for i, v in enumerate([110, 120, 130, 140])
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_normalize_by_group(df, "g", "id", "v").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["v"], r["norm_value"]))
    for g in ("a", "b"):
        vals = sorted(by_g[g])
        # same normalized multiset for both groups: the pooled values at
        # quantile positions 1/4, 2/4, 3/4, 4/4 of N=8 -> ranks 2,4,6,8
        pooled = sorted([10, 20, 30, 40, 110, 120, 130, 140])
        assert [n for _, n in vals] == [pooled[1], pooled[3], pooled[5], pooled[7]]
        # order preserved
        assert [n for _, n in vals] == sorted(n for _, n in vals)


def test_quantile_normalize_ties_share_value(spark):
    from wellmeet_data_pipeline_spark.operators.stats import (
        quantile_normalize_by_group,
    )

    rows = [("a", 1, 5), ("a", 2, 5), ("a", 3, 9), ("b", 4, 1), ("b", 5, 2), ("b", 6, 3)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r["id"]: r["norm_value"] for r in
           quantile_normalize_by_group(df, "g", "id", "v").collect()}
    assert out[1] == out[2]  # tied inputs -> one normalized value
    # identity case: normalizing one group against itself is monotone
    assert out[4] <= out[5] <= out[6]


def test_importance_ess_bounds(spark):
    from wellmeet_data_pipeline_spark.operators.stats import importance_ess_by_group

    # flat weights -> ESS/n = 1
    flat = spark.createDataFrame([("g", 0.5)] * 6, "g string, w double")
    assert importance_ess_by_group(flat, "g", "w").collect()[0]["ess_micro"] == 1_000_000

    # one dominant weight -> ESS/n near 1/n; truncation caps the ratio
    rows = [("g", 0.0)] * 9 + [("g", 10.0)]  # exp(10) >> cap 20
    df = spark.createDataFrame(rows, "g string, w double")
    r = importance_ess_by_group(df, "g", "w").collect()[0]
    # w = [1]*9 + [20] (capped, kilo grid): ESS/n = 29^2/(10*409)
    assert r["ess_micro"] == math.floor(29_000**2 / (10 * (9 * 1000**2 + 20_000**2)) * 1e6 + 0.5)


def test_ab_sample_size_known_answer(spark):
    from wellmeet_data_pipeline_spark.operators.stats import (
        TWO_Z_SUM_SQ,
        ab_sample_size_plan,
    )

    a, b = [10, 12, 14], [20, 24, 28]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ab_sample_size_plan(df, "g", F.col("v")).collect()[0]
    ma, mb = sum(a) / 3, sum(b) / 3
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 2
    exp = math.ceil(TWO_Z_SUM_SQ * ((va + vb) / 2) / (ma - mb) ** 2)
    assert r["n_required"] == exp

    # equal means -> NULL plan
    same = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 3)], "g string, v long"
    )
    assert ab_sample_size_plan(same, "g", F.col("v")).collect()[0]["n_required"] is None


def test_keyness_chi2_finds_planted_term(spark):
    """A term concentrated in one source must top that source's keyness
    list; a uniformly-spread term must not appear for any source."""
    from wellmeet_data_pipeline_spark.operators.scoring import keyness_chi2_top_terms

    filler = "common words shared across every source here"
    rows = [(i, f"{filler} zebra zebra", "a") for i in range(6)] + [
        (100 + i, filler, "b") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = keyness_chi2_top_terms(df, "source", k=5, min_count=5).collect()
    a_top = [r["term"] for r in out if r["source"] == "a"]
    assert a_top and a_top[0] == "zebra"
    assert all("zebra" != r["term"] for r in out if r["source"] == "b")
    # uniformly-spread filler terms are not key for anyone (no positive
    # association passes the exact-integer cross-multiply filter)
    assert all(r["term"] == "zebra" for r in out if r["source"] == "a")


def test_kaplan_meier_known_curve(spark):
    """durations: 1 (event), 2 (censored), 3 (event).
    S(1) = 2/3; at t=3 the risk set dies -> S = 0, log NULL."""
    from wellmeet_data_pipeline_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1)], "t long, obs long"
    )
    rows = {r["t"]: r for r in kaplan_meier(df, "t", "obs").collect()}
    assert set(rows) == {1, 3}  # censor-only times emit no row
    l1 = math.floor(math.log(2 / 3) * 1e6 + 0.5)
    assert rows[1]["n_risk"] == 3 and rows[1]["d_events"] == 1
    assert rows[1]["surv_log_micro"] == l1
    assert rows[1]["surv_micro"] == math.floor(math.exp(l1 / 1e6) * 1e6 + 0.5)
    assert rows[3]["n_risk"] == 1 and rows[3]["surv_micro"] == 0
    assert rows[3]["surv_log_micro"] is None


def test_kaplan_meier_censoring_keeps_at_risk(spark):
    """Censored-at-t subjects count as at-risk AT t (standard
    convention): event and censor at the same time share n_risk."""
    from wellmeet_data_pipeline_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(5, 1), (5, 0), (9, 0)], "t long, obs long"
    )
    r = kaplan_meier(df, "t", "obs").collect()
    assert len(r) == 1 and r[0]["t"] == 5
    assert r[0]["n_risk"] == 3 and r[0]["d_events"] == 1
    # S(5) = 2/3, never drops to 0 (remaining subjects censored)
    assert r[0]["surv_micro"] == math.floor(
        math.exp(math.floor(math.log(2 / 3) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5
    )


def test_clustering_coefficient_extremes(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import triangle_counts

    def gcc(edges_rows):
        edges = spark.createDataFrame(edges_rows, "id_a long, id_b long")
        per = triangle_counts(edges)
        agg = per.groupBy().agg(
            F.sum("n_triangles").alias("t3"),
            F.sum(F.col("degree") * (F.col("degree") - 1)).alias("w2"),
        ).collect()[0]
        return agg["t3"], agg["w2"]

    t3, w2 = gcc([(1, 2), (2, 3), (1, 3)])  # triangle
    assert t3 == 3 and w2 == 6 and 2 * t3 / w2 == 1.0
    t3, w2 = gcc([(1, 2), (2, 3)])  # path: one wedge, no triangle
    assert t3 == 0 and w2 == 2


def test_int8_recall_separated_vectors(spark):
    """Well-separated vectors: int8 quantization preserves the exact
    ranking, recall@k = k; and query codes come from the CANDIDATE
    quantizer (a query outside the candidate range must still code)."""
    from wellmeet_data_pipeline_spark.operators.similarity import int8_quant_recall

    def vec(n_neg):
        return [(-1.0 if i < n_neg else 1.0) for i in range(64)]

    rows = [(0, vec(0))] + [(i, vec(6 * i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    r = int8_quant_recall(df, k=3, every=50).collect()
    assert len(r) == 1 and r[0]["n_exact"] == 3 and r[0]["n_overlap"] == 3


def test_acf_and_zipf_on_driver_parquet(spark):
    """Range/shape pins on the real sf0.001 tables: ACF is a correlation
    (|acf| <= 1) present for every (type, lag); the Zipf fit has a
    negative slope and a valid R^2."""
    import os

    import pytest

    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver parquet missing")
    acf = REGISTRY["daily_revenue_acf"].fn(spark, sf).collect()
    assert {r["lag"] for r in acf} == {1, 2, 3, 7}
    assert all(-1_000_000 <= r["acf_micro"] <= 1_000_000 for r in acf)
    assert all(r["n_pairs"] >= 2 for r in acf)

    z = REGISTRY["zipf_rank_frequency"].fn(spark, sf).collect()[0]
    assert z["slope_micro"] < 0
    assert 0 <= z["r2_micro"] <= 1_000_000


def test_acf_periodic_signal_logic(spark):
    """The exact Pearson-on-lagged-pairs arithmetic: an alternating
    series has ACF(1) = -1 and ACF(2) = +1 on the micro grid.  Drives
    the same moment formula the query uses, via grouped_regression's
    sibling path (pairs built by epoch-day join semantics)."""
    from pyspark.sql import functions as F

    rows = [("t", d, 100 if d % 2 == 0 else 200) for d in range(12)]
    d = spark.createDataFrame(rows, "event_type string, di long, x long")
    lags = spark.createDataFrame([(1,), (2,)], "lag int")
    a = d.select("event_type", "di", F.col("x").alias("xa")).crossJoin(
        F.broadcast(lags)
    )
    b = d.select(
        F.col("event_type").alias("__et"),
        F.col("di").alias("__dib"),
        F.col("x").alias("xb"),
    )
    p = a.join(
        b,
        (F.col("__et") == F.col("event_type"))
        & (F.col("__dib") == F.col("di") + F.col("lag")),
    )
    m = p.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xa").alias("sa"), F.sum("xb").alias("sb"),
        F.sum(F.col("xa") * F.col("xa")).alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
        F.sum(F.col("xa") * F.col("xb")).alias("sab"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sab").cast("double") - F.col("sa").cast("double") * F.col("sb").cast("double")
    den = F.sqrt(
        (n * F.col("saa").cast("double") - F.col("sa").cast("double") * F.col("sa").cast("double"))
        * (n * F.col("sbb").cast("double") - F.col("sb").cast("double") * F.col("sb").cast("double"))
    )
    got = {
        r["lag"]: r["acf"]
        for r in m.select(
            "lag",
            F.floor(F.try_divide(num, den) * F.lit(1e6) + F.lit(0.5)).alias("acf"),
        ).collect()
    }
    assert got[1] == -1_000_000 and got[2] == 1_000_000


def test_assortativity_extremes(spark):
    """A star graph is maximally disassortative (r = -1); note the
    operator consumes raw undirected edges in either orientation."""
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY
    import pytest, os
    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver parquet missing")
    # drive the registry fn with an injected star edge frame
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long"
    )
    r = REGISTRY["dup_graph_assortativity"].fn(
        spark, "/root/testdata/sf0.001", shared_lsh_edges=star
    ).collect()[0]
    assert r["n_edges"] == 5 and r["assortativity_micro"] == -1_000_000
    # degree-regular graph (triangle): zero degree variance -> NULL
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    r2 = REGISTRY["dup_graph_assortativity"].fn(
        spark, "/root/testdata/sf0.001", shared_lsh_edges=tri
    ).collect()[0]
    assert r2["assortativity_micro"] is None
