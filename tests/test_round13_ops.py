"""Round-13 operators: EWMA control chart, Kendall tau-b, CUPED, Brier
decomposition, WOE/IV, overdispersion, Nelson-Aalen, SCD2 history, DP
contribution clip, HITS, link-prediction holdout, compaction plan,
priority sampling, edit-distance near-dup — known-answer and invariant
tests on micro frames (the oracle gate covers driver-parquet parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.dedup import (
    hits_integer,
    link_prediction_jaccard,
)
from wellmeet_data_pipeline_spark.operators.experiment import (
    brier_decomposition,
    cuped_adjusted,
    ewma_control_chart,
    ewma_weights,
    kendall_tau_b,
    overdispersion_index,
)
from wellmeet_data_pipeline_spark.operators.linkage import edit_distance_neardup
from wellmeet_data_pipeline_spark.operators.scoring import woe_information_value
from wellmeet_data_pipeline_spark.operators.sharding import (
    file_compaction_plan,
    priority_sample,
)
from wellmeet_data_pipeline_spark.operators.stats import (
    dp_contribution_clip_plan,
    nelson_aalen,
)
from wellmeet_data_pipeline_spark.operators.windows import scd2_history


def _series(spark, vals, g="a"):
    return spark.createDataFrame(
        [(g, i, int(v)) for i, v in enumerate(vals)], "g string, di long, v long"
    )


# ---------------------------------------------------------------------------
# EWMA control chart
# ---------------------------------------------------------------------------


def test_ewma_weights_decay_and_grid():
    w = ewma_weights()
    assert len(w) == 60 and w[0] == 1_000_000_000
    assert all(a > b for a, b in zip(w, w[1:]))  # strictly decaying
    assert w[-1] > 0  # truncation point still carries grid mass


def test_ewma_constant_series_is_flat_and_unbreached(spark):
    out = ewma_control_chart(_series(spark, [100] * 8), "g", "di", "v").collect()
    assert len(out) == 8
    for r in out:
        assert r["ewma_micro"] == 100_000_000  # ewma == the constant
        assert r["breach"] == 0  # sigma = 0 ⇒ limits == center == ewma


def test_ewma_first_point_equals_value(spark):
    # window holds only j=0 at t=1: ewma == v exactly
    out = ewma_control_chart(
        _series(spark, [7, 50, 50, 50]), "g", "di", "v"
    ).collect()
    first = next(r for r in out if r["di"] == 0)
    assert first["ewma_micro"] == 7_000_000


def test_ewma_step_lags_value(spark):
    # after a level step the EWMA sits strictly between old and new level
    out = ewma_control_chart(
        _series(spark, [0] * 6 + [1000] * 2), "g", "di", "v"
    ).collect()
    last = max(out, key=lambda r: r["di"])
    assert 0 < last["ewma_micro"] < 1_000_000_000


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


def _xy(spark, xs, ys, g="a"):
    return spark.createDataFrame(
        [(g, i, int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "g string, di long, x long, y long",
    )


def test_kendall_perfect_agreement(spark):
    r = kendall_tau_b(
        _xy(spark, [1, 2, 3, 4], [10, 20, 30, 40]), "g", "di", "x", "y"
    ).collect()[0]
    assert r["n0"] == 6 and r["nc"] == 6 and r["nd"] == 0
    assert r["tau_b_micro"] == 1_000_000


def test_kendall_perfect_reversal(spark):
    r = kendall_tau_b(
        _xy(spark, [1, 2, 3, 4], [40, 30, 20, 10]), "g", "di", "x", "y"
    ).collect()[0]
    assert r["tau_b_micro"] == -1_000_000


def test_kendall_all_tied_is_null(spark):
    r = kendall_tau_b(
        _xy(spark, [5, 5, 5], [1, 2, 3]), "g", "di", "x", "y"
    ).collect()[0]
    assert r["tau_b_micro"] is None  # x all tied ⇒ denominator 0


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def test_cuped_perfect_covariate_kills_variance(spark):
    # y = 3x exactly ⇒ theta = 3, y' is constant per the pooled mean:
    # var reduction = 1 in BOTH arms
    rows = [(i % 2, x, 3 * x) for i, x in enumerate([10, 20, 30, 40, 50, 60, 70, 80])]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    out = {r["arm"]: r for r in cuped_adjusted(df, "arm", "x", "y").collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["var_reduction_micro"] == 1_000_000


def test_cuped_independent_covariate_reduces_nothing(spark):
    # x constant ⇒ var(x) = 0 ⇒ theta NULL ⇒ adjusted stats NULL (the
    # degenerate-input convention), means still reported
    df = spark.createDataFrame(
        [(0, 5, 10), (1, 5, 30), (0, 5, 20), (1, 5, 40)],
        "arm long, x long, y long",
    )
    out = cuped_adjusted(df, "arm", "x", "y").collect()
    for r in out:
        assert r["mean_y_micro"] is not None
        assert r["var_reduction_micro"] is None


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------


def test_brier_perfect_forecast(spark):
    # p == y exactly: brier = 0, reliability = 0, resolution = uncertainty
    rows = [(1_000_000, 1)] * 6 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, "p_micro long, y long")
    r = brier_decomposition(df, "p_micro", "y").collect()[0]
    assert r["brier_micro"] == 0 and r["reliability_micro"] == 0
    assert r["resolution_micro"] == r["uncertainty_micro"] == 240_000  # 0.6*0.4


def test_brier_constant_base_rate_forecast(spark):
    # everyone forecast at the base rate: resolution = 0, rel = 0,
    # brier = uncertainty
    rows = [(600_000, 1)] * 6 + [(600_000, 0)] * 4
    df = spark.createDataFrame(rows, "p_micro long, y long")
    r = brier_decomposition(df, "p_micro", "y").collect()[0]
    assert r["resolution_micro"] == 0 and r["reliability_micro"] == 0
    assert r["brier_micro"] == r["uncertainty_micro"] == 240_000


# ---------------------------------------------------------------------------
# WOE / IV
# ---------------------------------------------------------------------------


def test_woe_signs_localize_separation(spark):
    # positives at high score, negatives at low: woe > 0 in the top bin,
    # < 0 in the bottom bin, and IV > 0 on every row
    rows = [(900_000, 1)] * 5 + [(900_000, 0)] * 1 + [(-900_000, 1)] * 1 + [(-900_000, 0)] * 5
    df = spark.createDataFrame(rows, "si long, y long")
    out = {r["bin"]: r for r in woe_information_value(df, "si", "y").collect()}
    assert out[9]["woe_micro"] > 0 and out[0]["woe_micro"] < 0
    ivs = {r["iv_micro"] for r in out.values()}
    assert len(ivs) == 1 and ivs.pop() > 0


def test_woe_one_class_bin_null_and_iv_unaffected(spark):
    rows = [(900_000, 1)] * 4 + [(-900_000, 0)] * 4  # both bins one-class
    df = spark.createDataFrame(rows, "si long, y long")
    out = woe_information_value(df, "si", "y").collect()
    assert all(r["woe_micro"] is None for r in out)
    assert all(r["iv_micro"] == 0 for r in out)


# ---------------------------------------------------------------------------
# Overdispersion
# ---------------------------------------------------------------------------


def test_overdispersion_known_answer(spark):
    # counts [2, 4, 6]: mean 4, sample var 4, D = 1, chi2 = 2
    df = spark.createDataFrame([("a", 2), ("a", 4), ("a", 6)], "g string, c long")
    r = overdispersion_index(df, "g", "c").collect()[0]
    assert r["mean_micro"] == 4_000_000 and r["var_micro"] == 4_000_000
    assert r["dispersion_micro"] == 1_000_000 and r["chi2_micro"] == 2_000_000


def test_overdispersion_degenerate_group_nulls(spark):
    df = spark.createDataFrame([("a", 7)], "g string, c long")
    r = overdispersion_index(df, "g", "c").collect()[0]
    assert r["var_micro"] is None and r["dispersion_micro"] is None


# ---------------------------------------------------------------------------
# Nelson-Aalen
# ---------------------------------------------------------------------------


def test_nelson_aalen_known_answer(spark):
    # durations: events at t=1 (2 of 5 at risk), t=3 (1 of 2); censored
    # at t=2 (1).  H(1) = 2/5, H(3) = 2/5 + 1/2
    rows = [(1, 1), (1, 1), (2, 0), (3, 1), (3, 0)]
    df = spark.createDataFrame(rows, "t long, obs long")
    out = {r["t"]: r for r in nelson_aalen(df, "t", "obs").collect()}
    assert out[1]["n_risk"] == 5 and out[1]["d_events"] == 2
    assert out[1]["hazard_step_micro"] == 400_000
    assert out[3]["n_risk"] == 2 and out[3]["hazard_step_micro"] == 500_000
    assert out[3]["cum_hazard_micro"] == 900_000


def test_nelson_aalen_monotone_cumulative(spark):
    rows = [(t, 1) for t in [1, 1, 2, 3, 5, 8, 13]]
    df = spark.createDataFrame(rows, "t long, obs long")
    out = sorted(nelson_aalen(df, "t", "obs").collect(), key=lambda r: r["t"])
    cums = [r["cum_hazard_micro"] for r in out]
    assert cums == sorted(cums) and all(r["hazard_step_micro"] > 0 for r in out)


# ---------------------------------------------------------------------------
# SCD2 history
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs_and_versions(spark):
    rows = [
        (1, "A", 10, 1),
        (1, "A", 20, 2),  # same state: collapsed into version 1
        (1, "B", 30, 3),
        (1, "A", 40, 4),  # returning to A opens a NEW version
        (2, "X", 10, 5),
    ]
    df = spark.createDataFrame(rows, "uid long, st string, ts long, tie long")
    out = scd2_history(df, "uid", "st", "ts", "tie").collect()
    u1 = sorted([r for r in out if r["uid"] == 1], key=lambda r: r["version"])
    assert [r["state"] for r in u1] == ["A", "B", "A"]
    assert [r["effective_from"] for r in u1] == [10, 30, 40]
    assert [r["effective_to"] for r in u1] == [30, 40, None]
    assert [r["is_current"] for r in u1] == [0, 0, 1]
    u2 = [r for r in out if r["uid"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_scd2_ranges_tile_without_gaps(spark):
    # effective_to of version k == effective_from of version k+1
    rows = [(1, s, t, t) for t, s in enumerate("AABBBCACC")]
    df = spark.createDataFrame(rows, "uid long, st string, ts long, tie long")
    out = sorted(
        scd2_history(df, "uid", "st", "ts", "tie").collect(),
        key=lambda r: r["version"],
    )
    for prev, nxt in zip(out, out[1:]):
        assert prev["effective_to"] == nxt["effective_from"]
    assert out[-1]["effective_to"] is None


# ---------------------------------------------------------------------------
# DP contribution clip
# ---------------------------------------------------------------------------


def test_dp_clip_bound_is_exact_p95(spark):
    # 100 contributions of 1..100: nearest-rank p95 = 95
    df = spark.createDataFrame(
        [("a", c) for c in range(1, 101)], "g string, c long"
    )
    r = dp_contribution_clip_plan(df, "g", "c", pct=95).collect()[0]
    assert r["clip_bound"] == 95 and r["n_units"] == 100
    assert r["raw_total"] == 5050
    # clipped: 96..100 each lose (c - 95)
    assert r["clipped_total"] == 5050 - sum(c - 95 for c in range(96, 101))


def test_dp_clip_noop_when_bound_is_max(spark):
    df = spark.createDataFrame([("a", 3)] * 10, "g string, c long")
    r = dp_contribution_clip_plan(df, "g", "c", pct=95).collect()[0]
    assert r["clip_bound"] == 3 and r["clipped_total"] == r["raw_total"]
    assert r["clipped_share_micro"] == 0


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_hits_star_graph(spark):
    # star 1 -> {2, 3, 4} (canonical orientation low -> high): node 1 is
    # the max hub, leaves are equal authorities at the max grid value
    out = {r["node"]: r for r in hits_integer(_edges(spark, [(1, 2), (1, 3), (1, 4)]), iters=2).collect()}
    assert out[1]["hub_micro"] == 1_000_000 and out[1]["auth_micro"] == 0
    for leaf in (2, 3, 4):
        assert out[leaf]["auth_micro"] == 1_000_000
        assert out[leaf]["hub_micro"] == 0


def test_hits_chain_orientation(spark):
    # chain 1->2->3: node 2 is both hub and authority, never zero on both
    out = {r["node"]: r for r in hits_integer(_edges(spark, [(1, 2), (2, 3)]), iters=2).collect()}
    assert out[2]["auth_micro"] > 0 and out[2]["hub_micro"] > 0
    assert out[1]["auth_micro"] == 0 and out[3]["hub_micro"] == 0


# ---------------------------------------------------------------------------
# Link prediction (holdout)
# ---------------------------------------------------------------------------


def test_link_prediction_recovers_held_out_clique_edge(spark):
    # K4 on {1,2,3,4}: hold out whichever edges hash to the fold; the
    # survivors' shared neighborhoods must rank every held-out edge in
    # the predictions with held_out = 1
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    held = [(a, b) for a, b in k4 if (a * 31 + b) % 5 == 0]
    assert held  # the fixture must actually exercise the holdout
    out = link_prediction_jaccard(
        _edges(spark, k4), top_k=10, holdout_mod=5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out if r["held_out"] == 1}
    assert set(held) <= got


def test_link_prediction_full_graph_empty_on_clique(spark):
    # the clique property that motivated the holdout form: no holdout,
    # no predictions
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert link_prediction_jaccard(_edges(spark, k4), top_k=10).count() == 0


# ---------------------------------------------------------------------------
# Compaction plan
# ---------------------------------------------------------------------------


def test_compaction_bins_fill_to_target(spark):
    # 10 items of 30 bytes, target 100: exclusive cumsums 0,30,...,270
    # divide into bins [4, 3, 3] (bin = cum_before div 100)
    df = spark.createDataFrame(
        [("p", i, 30) for i in range(10)], "part string, k long, sz long"
    )
    out = {r["bin"]: r for r in file_compaction_plan(df, "part", "k", "sz", 100).collect()}
    assert [out[b]["n_items"] for b in sorted(out)] == [4, 3, 3]
    assert out[0]["bin_bytes"] == 120 and out[0]["fill_micro"] == 1_200_000


def test_compaction_oversized_item_overflows_own_bin(spark):
    df = spark.createDataFrame(
        [("p", 1, 250), ("p", 2, 10)], "part string, k long, sz long"
    )
    out = {r["bin"]: r for r in file_compaction_plan(df, "part", "k", "sz", 100).collect()}
    assert out[0]["n_items"] == 1 and out[0]["fill_micro"] == 2_500_000
    assert out[2]["n_items"] == 1  # next item lands at cum 250 div 100 = 2


# ---------------------------------------------------------------------------
# Priority sampling
# ---------------------------------------------------------------------------


def test_priority_sample_deterministic_and_ranked(spark):
    df = spark.createDataFrame(
        [(i, 10 + (i % 7) * 5) for i in range(200)], "k long, w long"
    )
    a = priority_sample(df, "k", "w", k=20).collect()
    b = priority_sample(df, "k", "w", k=20).collect()
    assert [r["k"] for r in a] == [r["k"] for r in b]  # reproducible
    prios = [r["priority_atto"] for r in a]
    assert prios == sorted(prios) and len(a) == 20
    assert [r["rank"] for r in a] == list(range(1, 21))


def test_priority_sample_weight_bias(spark):
    # 10x-heavier items must dominate the sample (inclusion ~ w/tau)
    df = spark.createDataFrame(
        [(i, 1000 if i < 50 else 100) for i in range(500)], "k long, w long"
    )
    out = priority_sample(df, "k", "w", k=40).collect()
    heavy = sum(1 for r in out if r["k"] < 50)
    # expected ~21 under inclusion ~ w/tau; this deterministic draw gives
    # 14 — pin well above the uniform share (40 * 50/500 = 4), not at the
    # expectation (a single fixed hash draw sits anywhere in the binomial
    # band)
    assert heavy >= 10


def test_priority_sample_growth_never_reshuffles_survivors(spark):
    # adding items can only DISPLACE tail entries, never reorder the
    # survivors (each key's priority is independent of the population)
    small = spark.createDataFrame([(i, 50) for i in range(100)], "k long, w long")
    big = spark.createDataFrame([(i, 50) for i in range(300)], "k long, w long")
    a = [r["k"] for r in priority_sample(small, "k", "w", k=10).collect()]
    b = {r["k"]: r["rank"] for r in priority_sample(big, "k", "w", k=10).collect()}
    kept = [k for k in a if k in b]
    assert [b[k] for k in kept] == sorted(b[k] for k in kept)


# ---------------------------------------------------------------------------
# Edit-distance near-dup
# ---------------------------------------------------------------------------


def test_edit_distance_finds_small_edits_in_block(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dig"),  # 1 edit
        (3, "the quick brown fox leaps over a lazy dog today"),  # few edits
        (4, "completely different text about spark engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, __norm string")
    out = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in edit_distance_neardup(df).collect()}
    assert out[(1, 2)] == 1
    assert (1, 4) not in out and (2, 4) not in out


def test_edit_distance_prefix_block_is_documented_pigeonhole(spark):
    # a pair differing INSIDE the first 10 chars is (by design) missed —
    # the docstring hands it to the LSH pass; pin the behavior
    rows = [
        (1, "aaaaaaaaaa same tail of the document body"),
        (2, "bbbbbbbbbb same tail of the document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, __norm string")
    assert edit_distance_neardup(df).count() == 0


# ---------------------------------------------------------------------------
# Prefix-filter Jaccard join (wave 2)
# ---------------------------------------------------------------------------


def test_prefix_join_exact_and_complete(spark):
    # brute-force ground truth on a small token-set universe: the prefix
    # filter must return EXACTLY the >= 3/5 pairs (completeness is the
    # point of the algorithm vs LSH)
    from wellmeet_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_join

    sets = {
        1: {"a", "b", "c", "d", "e"},
        2: {"a", "b", "c", "d", "x"},  # J(1,2) = 4/6 = 0.67
        3: {"a", "b", "c", "d", "e"},  # J(1,3) = 1.0
        4: {"p", "q", "r"},            # disjoint
        5: {"a", "p", "q", "r"},       # J(4,5) = 3/4 = 0.75
    }
    rows = [(i, t) for i, toks in sets.items() for t in toks]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_micro"]
        for r in prefix_filter_jaccard_join(df, 3, 5).collect()
    }
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 5 >= 3 * union:
                    want[(a, b)] = inter * 1_000_000 // union
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 1_000_000


def test_prefix_join_threshold_excludes(spark):
    from wellmeet_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_join

    rows = [(1, t) for t in "abcde"] + [(2, t) for t in "aXYZW"]  # J = 1/9
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    assert prefix_filter_jaccard_join(df, 3, 5).count() == 0


# ---------------------------------------------------------------------------
# Touch attribution (wave 2)
# ---------------------------------------------------------------------------


def test_attribution_first_vs_last(spark):
    from wellmeet_data_pipeline_spark.operators.experiment import touch_attribution

    # user 1: click(day1) -> view(day2) -> purchase(day3, 500c):
    # first credits click, last credits view.  user 2: no touch -> direct.
    def ts(day):
        return f"2024-01-0{day} 12:00:00"

    touches = spark.createDataFrame(
        [(1, ts(1), 10, "click"), (1, ts(2), 11, "view")],
        "user_id long, ts string, event_id long, channel string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    convs = spark.createDataFrame(
        [(1, ts(3), 20, 500), (2, ts(3), 21, 300)],
        "user_id long, ts string, event_id long, cents long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["model"], r["channel"]): (r["n_conversions"], r["attributed_cents"])
        for r in touch_attribution(touches, convs).collect()
    }
    assert out[("first", "click")] == (1, 500)
    assert out[("last", "view")] == (1, 500)
    assert out[("first", "direct")] == (1, 300)
    assert out[("last", "direct")] == (1, 300)


def test_attribution_lookback_excludes_stale_touch(spark):
    from wellmeet_data_pipeline_spark.operators.experiment import touch_attribution

    touches = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, "click")],
        "user_id long, ts string, event_id long, channel string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    convs = spark.createDataFrame(
        [(1, "2024-01-20 00:00:00", 20, 100)],
        "user_id long, ts string, event_id long, cents long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["model"], r["channel"])
        for r in touch_attribution(touches, convs, lookback_days=7).collect()
    }
    assert out == {("first", "direct"), ("last", "direct")}


# ---------------------------------------------------------------------------
# Krippendorff's alpha (wave 2)
# ---------------------------------------------------------------------------


def test_krippendorff_perfect_agreement(spark):
    from wellmeet_data_pipeline_spark.operators.stats import krippendorff_alpha_nominal

    rows = [(u, r, "x" if u % 2 else "y") for u in range(10) for r in range(3)]
    df = spark.createDataFrame(rows, "unit long, rater long, label string")
    r = krippendorff_alpha_nominal(df).collect()[0]
    assert r["do_micro"] == 0 and r["alpha_micro"] == 1_000_000


def test_krippendorff_known_answer(spark):
    from wellmeet_data_pipeline_spark.operators.stats import krippendorff_alpha_nominal

    # 4 units x 2 raters: units 1-3 agree on distinct labels, unit 4
    # disagrees (a, b).  n = 8.
    # D_o = (1/8) * [unit4: 2 ordered disagreeing pairs / (2-1)] = 0.25
    # marginals: a:4? -> labels: u1 (x,x) u2 (y,y) u3 (z,z) u4 (a,b)
    # pairs_same = 4*... n_c: x2 y2 z2 a1 b1 -> sum n_c(n_c-1) = 2+2+2 = 6
    # D_e = (8*7 - 6) / (8*7) = 50/56; alpha = 1 - 0.25/(50/56) = 0.72
    rows = [
        (1, 0, "x"), (1, 1, "x"),
        (2, 0, "y"), (2, 1, "y"),
        (3, 0, "z"), (3, 1, "z"),
        (4, 0, "a"), (4, 1, "b"),
    ]
    df = spark.createDataFrame(rows, "unit long, rater long, label string")
    r = krippendorff_alpha_nominal(df).collect()[0]
    assert r["n_units"] == 4 and r["n_ratings"] == 8
    assert r["do_micro"] == 250_000
    import math

    assert r["de_micro"] == math.floor(50 / 56 * 1e6 + 0.5)
    assert r["alpha_micro"] == math.floor((1 - 0.25 / (50 / 56)) * 1e6 + 0.5)


def test_krippendorff_singleton_units_drop(spark):
    from wellmeet_data_pipeline_spark.operators.stats import krippendorff_alpha_nominal

    rows = [(1, 0, "x"), (1, 1, "x"), (2, 0, "y")]  # unit 2: one rating
    df = spark.createDataFrame(rows, "unit long, rater long, label string")
    r = krippendorff_alpha_nominal(df).collect()[0]
    assert r["n_units"] == 1 and r["n_ratings"] == 2


# ---------------------------------------------------------------------------
# Confusable fold (wave 2)
# ---------------------------------------------------------------------------


def test_fold_confusables_maps_homoglyphs(spark):
    from wellmeet_data_pipeline_spark.functions.text import fold_confusables

    # Cyrillic а/е/о + Greek ο fold to latin; plain latin untouched
    df = spark.createDataFrame([("привет hellо wоrld",), ("plain ascii",)], "t string")
    out = [r[0] for r in df.select(fold_confusables("t")).collect()]
    assert out[1] == "plain ascii"
    assert "о" not in out[0]  # no Cyrillic o survives


# ---------------------------------------------------------------------------
# Ratio-metric delta CI + SRM (wave 2b)
# ---------------------------------------------------------------------------


def test_ratio_ci_constant_ratio_zero_se(spark):
    from wellmeet_data_pipeline_spark.operators.experiment import ratio_metric_delta_ci

    # x = 2y per unit exactly: R = 2, delta-method variance = 0
    rows = [(0, 2 * y, y) for y in (5, 10, 15, 20)]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = ratio_metric_delta_ci(df).collect()[0]
    assert r["ratio_micro"] == 2_000_000 and r["se_micro"] == 0
    assert r["lo_micro"] == r["hi_micro"] == 2_000_000


def test_ratio_ci_interval_brackets_ratio(spark):
    from wellmeet_data_pipeline_spark.operators.experiment import ratio_metric_delta_ci

    rows = [(0, x, y) for x, y in [(10, 5), (30, 6), (5, 9), (25, 4)]]
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = ratio_metric_delta_ci(df).collect()[0]
    assert r["lo_micro"] < r["ratio_micro"] < r["hi_micro"]
    assert r["se_micro"] > 0


def test_srm_balanced_passes_biased_flags(spark):
    from wellmeet_data_pipeline_spark.operators.experiment import srm_check

    balanced = spark.createDataFrame(
        [(i, i % 2) for i in range(1000)], "uid long, arm long"
    )
    out = srm_check(balanced, "arm").collect()
    assert all(r["srm_flag"] == 0 for r in out)
    assert all(r["chi2_term_micro"] == 0 for r in out)

    # 600/400 split on n=1000 vs 50/50: chi2 = 40 >> 3.84 — flag fires
    biased = spark.createDataFrame(
        [(i, 0 if i < 600 else 1) for i in range(1000)], "uid long, arm long"
    )
    out = srm_check(biased, "arm").collect()
    assert all(r["srm_flag"] == 1 for r in out)
    assert out[0]["chi2_total_micro"] == 40_000_000
