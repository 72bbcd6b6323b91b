"""Distribution-shift tests and classical statistics over grouped data.

A training-data pipeline's monitoring layer runs these reads next to
quality scoring: "did this source's length distribution drift", "is
variant A's metric different from variant B's", "when did the daily
mean shift".  The reference pipeline's monitoring stops at count-style
health checks (review-crawler's per-run count logs,
`review-crawler/main.py:33,41` and the save-reviews result tallies,
`save-reviews/lambda_function.py:96-107`); these operators generalize
that to proper two-sample tests and calibration reads while keeping
the repo's exactness discipline:

- ks_drift_by_group: two-sample Kolmogorov-Smirnov statistic of each
  group against the pooled rest; the sup runs on cross-multiplied
  BIGINTs so the argmax is exact (no ECDF doubles until the final
  snap).
- mann_whitney_by_group: rank-sum U of each group vs the rest from ONE
  global average-ranking (doubled ranks stay integer under ties), with
  the tie-corrected normal approximation snapped to the micro grid.
- welch_t_pairs: Welch's unequal-variance t between every pair of
  groups from per-group (n, sum, sum-of-squares) integer moments.
- conformal_coverage: split-conformal calibration per group — the
  calibration half's nonconformity quantile is an exact order
  statistic, coverage is measured on the held-out half.
- grouped_regression: per-group OLS slope/intercept/R^2 from exact
  integer moment sums.  Spark's regr_slope/regr_r2 aggregates (and
  DuckDB's) accumulate DOUBLES in partition order, which is not
  oracle-stable; integer moments are, and the closed forms need
  nothing else.
- cusum_changepoint: CUSUM changepoint argmax_k |n*S_k - k*T| over a
  per-group ordered series, exact BIGINT throughout (the scaled form
  avoids the mean division entirely).

Determinism rules (scoring.py module docstring): aggregate exact
integers only; doubles appear in the final projection, computed from
those integers with the same expression shape the oracle uses, then
snapped with floor(x + 0.5) — never round().

Scale shape: every operator pre-collapses to group-level or
value-histogram grain before any window.  The KS/MWU value grid is
pooled-distinct-values sized (bucket continuous measures upstream);
the only global cumsum goes through global_rank_cumsum, the
range-partitioned two-pass prefix sum, so no unpartitioned WindowExec
appears at any cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.windows import global_rank_cumsum

MICRO = 1_000_000


def snap_micro(x: Column) -> Column:
    """floor(x*1e6 + 0.5) as BIGINT — the repo's standard micro-grid snap
    (exact on doubles; round() is not cross-engine-stable on .5 grid
    points)."""
    return F.floor(x * F.lit(float(MICRO)) + F.lit(0.5)).cast("long")


def ks_drift_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample KS statistic of every group's `value_col` distribution
    against the pooled REST of the data (the drift read: which source
    moved away from the corpus).

    sup_x |F_g(x) - F_rest(x)| is evaluated on the pooled value grid —
    both ECDFs only jump there, so the sup is attained at a grid point.
    With cum_g(v) and cum_all(v) the inclusive cumulative counts,

        dev(g, v) = | cum_g*(N - n_g) - (cum_all - cum_g)*n_g |   (BIGINT)
        KS(g)     = max_v dev / (n_g * (N - n_g))

    dev is exact integer, so the max and its argmin-value tiebreak are
    exact; only the final normalization is a double (from exact ints,
    then micro-snapped).  Emits per group: n_group, n_rest, ks_micro,
    and ks_at_value (the SMALLEST grid value attaining the sup).

    Scale: the grid frame is |groups| x |distinct values| (histogram
    grain, not row grain); the global cumulative runs through
    global_rank_cumsum; the per-group running sum windows over the
    value grid only.

    Domain: rows with a NULL group or NULL value are excluded up front
    (an ECDF over NULL is meaningless, and NULL ordering/equality
    semantics differ between Spark windows and SQL joins — the oracle
    carries the same WHERE).
    """
    df = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    hist = (
        df.groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("__cnt"))
        .localCheckpoint(eager=False)  # feeds grid, totals, and the frame
    )
    groups = hist.groupBy(group_col).agg(F.sum("__cnt").alias("__n_g"))
    vhist = hist.groupBy(value_col).agg(F.sum("__cnt").alias("__cnt_all"))
    vcum = global_rank_cumsum(
        vhist, [F.col(value_col).asc()], sum_col="__cnt_all", cum_col="__cum_all"
    ).select(value_col, "__cum_all")
    total = hist.agg(F.sum("__cnt").alias("__n_all"))

    frame = (
        vcum.crossJoin(F.broadcast(groups))
        .join(hist, [group_col, value_col], "left")
        .na.fill({"__cnt": 0})
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    frame = frame.withColumn("__cum_g", F.sum("__cnt").over(w)).crossJoin(
        F.broadcast(total)
    )
    dev = F.abs(
        F.col("__cum_g") * (F.col("__n_all") - F.col("__n_g"))
        - (F.col("__cum_all") - F.col("__cum_g")) * F.col("__n_g")
    )
    devf = frame.select(
        group_col,
        value_col,
        F.col("__n_g"),
        (F.col("__n_all") - F.col("__n_g")).alias("__n_r"),
        dev.alias("__dev"),
    )
    peak = devf.groupBy(group_col).agg(
        F.max("__dev").alias("__dev_max"),
        F.max("__n_g").alias("n_group"),
        F.max("__n_r").alias("n_rest"),
    )
    at = (
        devf.join(peak.select(group_col, "__dev_max"), group_col)
        .filter(F.col("__dev") == F.col("__dev_max"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias("ks_at_value"))
    )
    return (
        peak.join(at, group_col)
        .select(
            group_col,
            "n_group",
            "n_rest",
            snap_micro(
                F.try_divide(
                    F.col("__dev_max").cast("double"),
                    F.col("n_group").cast("double") * F.col("n_rest").cast("double"),
                )
            ).alias("ks_micro"),
            "ks_at_value",
        )
    )


def mann_whitney_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U of every group vs the pooled rest, from ONE global
    average-ranking of the pooled values (ranks are shared across all
    group-vs-rest comparisons, so the ranking is computed once).

    Ties take the average rank; doubling keeps it integer:

        rank2(v) = 2*cum_less(v) + cnt_all(v) + 1
        2*R_g    = sum_v cnt_g(v) * rank2(v)
        2*U_g    = 2*R_g - 2 * n_g*(n_g+1)/2 = 2*R_g - n_g*(n_g+1)

    The normal approximation uses the tie-corrected variance

        Var(U) = n_g*n_r/12 * [ (N+1) - sum_v (t^3 - t) / (N*(N-1)) ]

    z = (U - n_g*n_r/2) / sqrt(Var) is computed in doubles from the
    exact integer moments, then micro-snapped.  Emits per group:
    n_group, u2 (= 2*U, exact), z_micro.  NULL groups/values are
    excluded up front (see ks_drift_by_group).
    """
    df = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    hist = (
        df.groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    vhist = hist.groupBy(value_col).agg(F.sum("__cnt").alias("__cnt_all"))
    vcum = global_rank_cumsum(
        vhist, [F.col(value_col).asc()], sum_col="__cnt_all", cum_col="__cum_all"
    ).select(
        value_col,
        "__cnt_all",
        (2 * (F.col("__cum_all") - F.col("__cnt_all")) + F.col("__cnt_all") + 1).alias(
            "__rank2"
        ),
    )
    ties = vcum.agg(
        F.sum(
            F.col("__cnt_all") * F.col("__cnt_all") * F.col("__cnt_all")
            - F.col("__cnt_all")
        ).alias("__tie_sum"),
        F.sum("__cnt_all").alias("__n_all"),
    )
    per_g = (
        hist.join(vcum.select(value_col, "__rank2"), value_col)
        .groupBy(group_col)
        .agg(
            F.sum("__cnt").alias("n_group"),
            F.sum(F.col("__cnt") * F.col("__rank2")).alias("__r2"),
        )
        .crossJoin(F.broadcast(ties))
    )
    n_g = F.col("n_group")
    n_r = F.col("__n_all") - n_g
    u2 = F.col("__r2") - n_g * (n_g + 1)
    mean2 = n_g * n_r  # = 2 * E[U]
    nd = F.col("__n_all").cast("double")
    var_u = (
        n_g.cast("double")
        * n_r.cast("double")
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("__tie_sum").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    z = F.try_divide((u2 - mean2).cast("double"), F.lit(2.0) * F.sqrt(var_u))
    return per_g.select(
        group_col, "n_group", u2.alias("u2"), snap_micro(z).alias("z_micro")
    )


def welch_t_pairs(
    df: DataFrame,
    group_col: str,
    value_long: Column,
) -> DataFrame:
    """Welch's unequal-variance t-test between every ordered pair of
    groups (the A/B read).  `value_long` must already sit on an exact
    integer grid (cents).

    Per group the exact moments (n, s1 = sum, s2 = sum of squares)
    collapse map-side; the pair frame is |groups|^2 rows.  Sample
    variance in the cross-multiplied form  var = (n*s2 - s1^2) /
    (n*(n-1))  and the Welch statistic

        t  = (s1a/na - s1b/nb) / sqrt(va/na + vb/nb)
        df = (va/na + vb/nb)^2 / [ (va/na)^2/(na-1) + (vb/nb)^2/(nb-1) ]

    are doubles computed from the exact integers, micro-snapped.  Emits
    group_a < group_b with n_a, n_b, mean_diff_micro (in value units),
    t_micro, df_micro.
    """
    m = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(value_long).cast("long").alias("__s1"),
        F.sum(value_long * value_long).cast("long").alias("__s2"),
    )
    a = m.select(
        F.col(group_col).alias("group_a"),
        F.col("__n").alias("__na"),
        F.col("__s1").alias("__s1a"),
        F.col("__s2").alias("__s2a"),
    )
    b = m.select(
        F.col(group_col).alias("group_b"),
        F.col("__n").alias("__nb"),
        F.col("__s1").alias("__s1b"),
        F.col("__s2").alias("__s2b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    va = F.try_divide(
        na * F.col("__s2a").cast("double")
        - F.col("__s1a").cast("double") * F.col("__s1a").cast("double"),
        na * (na - F.lit(1.0)),
    )
    vb = F.try_divide(
        nb * F.col("__s2b").cast("double")
        - F.col("__s1b").cast("double") * F.col("__s1b").cast("double"),
        nb * (nb - F.lit(1.0)),
    )
    sa, sb = va / na, vb / nb
    mean_diff = F.col("__s1a").cast("double") / na - F.col("__s1b").cast("double") / nb
    t = F.try_divide(mean_diff, F.sqrt(sa + sb))
    dof = F.try_divide(
        (sa + sb) * (sa + sb),
        sa * sa / (na - F.lit(1.0)) + sb * sb / (nb - F.lit(1.0)),
    )
    return pairs.select(
        "group_a",
        "group_b",
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        snap_micro(mean_diff).alias("mean_diff_micro"),
        snap_micro(t).alias("t_micro"),
        snap_micro(dof).alias("df_micro"),
    )


def conformal_coverage(
    df: DataFrame,
    group_col: str,
    value_long: Column,
    id_col: str,
    q_pct: int = 90,
) -> DataFrame:
    """Split-conformal calibration per group (the uncertainty read a
    model-serving pipeline runs: does the q%-interval actually cover
    q% of held-out points?).

    Deterministic split on id parity (pmod, so negative ids land in a
    half too — Spark's sign-preserving % would drop them from both):
    even ids calibrate, odd ids test.
    The per-group point prediction is the calibration floor-mean,
    written as floor(sum::double / n) in BOTH engines — Spark's integer
    `div` truncates while DuckDB's `//` floors, so the two disagree on
    negative sums (the hostile fixture injects negated values); the
    double floor is exact for |sum| < 2^53 and floors everywhere.
    Nonconformity is |value - pred|.
    The calibration quantile is the exact k-th smallest nonconformity
    with k = min(ceil(q*(n_cal+1)/100), n_cal) — the finite-sample
    conformal index — selected by row_number, so ties are harmless (the
    VALUE at position k is unique regardless of tie order).  Coverage on
    the test half is exact-integer: cov_micro = 1e6 * n_covered // n_test.

    `value_long` must be a NONNEGATIVE exact-integer column (cents);
    NULL values are excluded — a NULL nonconformity would sit at a
    different end of the rank window's order in Spark (nulls first) vs
    SQL (nulls last), shifting the calibration quantile (r11 hostile
    catch).  Scale: per-group windows over the calibration half only;
    groups with an empty half drop out (inner joins).
    """
    base = df.filter(value_long.isNotNull()).select(
        F.col(group_col),
        F.col(id_col).alias("__id"),
        value_long.cast("long").alias("__v"),
    )
    cal = base.filter(F.pmod(F.col("__id"), F.lit(2)) == 0)
    test = base.filter(F.pmod(F.col("__id"), F.lit(2)) == 1)
    pred = cal.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_cal"),
        F.floor(F.sum("__v").cast("double") / F.count("*")).cast("long").alias("pred"),
    )
    k = F.least(
        F.expr(f"({q_pct} * (n_cal + 1) + 99) div 100").cast("long"), F.col("n_cal")
    )
    pred = pred.withColumn("__k", k)
    scored = cal.join(F.broadcast(pred), group_col).withColumn(
        "__nc", F.abs(F.col("__v") - F.col("pred"))
    )
    w = Window.partitionBy(group_col).orderBy("__nc", "__id")
    qhat = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == F.col("__k"))
        .select(group_col, F.col("__nc").alias("q_cents"))
    )
    cov = (
        test.join(F.broadcast(pred.select(group_col, "pred")), group_col)
        .join(F.broadcast(qhat), group_col)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (F.abs(F.col("__v") - F.col("pred")) <= F.col("q_cents")).cast("long")
            ).alias("__n_cov"),
        )
    )
    return (
        pred.select(group_col, "n_cal", F.col("pred").alias("pred_cents"))
        .join(qhat, group_col)
        .join(cov, group_col)
        .select(
            group_col,
            "n_cal",
            "n_test",
            "pred_cents",
            "q_cents",
            F.expr(f"(cast({MICRO} as bigint) * __n_cov) div n_test")
            .cast("long")
            .alias("cov_micro"),
        )
    )


def grouped_regression(
    df: DataFrame,
    group_col: str,
    x_long: Column,
    y_long: Column,
) -> DataFrame:
    """Per-group simple OLS of y on x from exact integer moment sums.

    The built-in regr_slope / regr_intercept / regr_r2 aggregates
    accumulate double partials in partition order — not oracle-stable.
    Here (n, sx, sy, sxx, sxy, syy) are exact BIGINTs; the closed forms

        slope     = (n*sxy - sx*sy) / (n*sxx - sx^2)
        intercept = (sy*sxx - sx*sxy) / (n*sxx - sx^2)
        r2        = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)(n*syy - sy^2))

    evaluate in doubles FROM those integers (deterministic: one final
    projection, no distributed double accumulation), micro-snapped.
    Zero-variance groups emit NULLs via try_divide.  x/y must sit on an
    exact integer grid sized so the moment sums stay under 2^63 at the
    target scale (the n*syy PRODUCT is formed in doubles, so only the
    per-group syy sum itself must fit)."""
    m = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x_long).cast("long").alias("__sx"),
        F.sum(y_long).cast("long").alias("__sy"),
        F.sum(x_long * x_long).cast("long").alias("__sxx"),
        F.sum(x_long * y_long).cast("long").alias("__sxy"),
        F.sum(y_long * y_long).cast("long").alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, sxy, syy = (
        F.col("__sxx").cast("double"),
        F.col("__sxy").cast("double"),
        F.col("__syy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return m.select(
        group_col,
        "n",
        snap_micro(F.try_divide(cov_n, var_x)).alias("slope_micro"),
        snap_micro(F.try_divide(sy * sxx - sx * sxy, var_x)).alias("intercept_micro"),
        snap_micro(F.try_divide(cov_n * cov_n, var_x * var_y)).alias("r2_micro"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    period_col: str,
    value_long: Column,
) -> DataFrame:
    """CUSUM changepoint per group over a period-ordered series: the
    period k maximizing |S_k - k*mean| where S_k is the running sum of
    per-period totals.  Scaled by n to stay integer:

        dev_k = | n * S_k - k * T |       (BIGINT, exact)

    The argmax is the single most likely mean-shift point (CUSUM /
    binary-segmentation first split).  Ties resolve to the EARLIEST
    period.  Emits per group: cp_period, n_periods, total, dev_max —
    all exact integers, no snapping needed.

    Scale: collapses to (group, period) grain first; the running sum
    windows per group over periods only (bounded by the calendar, not
    the data).  NULL groups/periods are excluded up front (Spark windows
    order NULLS FIRST, DuckDB NULLS LAST — a series point at NULL time
    has no position anyway)."""
    df = df.filter(F.col(group_col).isNotNull() & F.col(period_col).isNotNull())
    daily = df.groupBy(group_col, period_col).agg(
        F.sum(value_long).cast("long").alias("__x")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(period_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        group_col,
        period_col,
        F.sum("__x").over(w).alias("__s"),
        F.row_number()
        .over(Window.partitionBy(group_col).orderBy(period_col))
        .cast("long")
        .alias("__k"),
    )
    tot = daily.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_periods"),
        F.sum("__x").alias("total"),
    )
    devf = cum.join(F.broadcast(tot), group_col).select(
        group_col,
        period_col,
        "n_periods",
        "total",
        F.abs(
            F.col("n_periods") * F.col("__s") - F.col("__k") * F.col("total")
        ).alias("__dev"),
    )
    peak = devf.groupBy(group_col).agg(F.max("__dev").alias("dev_max"))
    return (
        devf.join(peak, group_col)
        .filter(F.col("__dev") == F.col("dev_max"))
        .groupBy(group_col)
        .agg(
            F.min(period_col).alias("cp_period"),
            F.max("n_periods").alias("n_periods"),
            F.max("total").alias("total"),
            F.max("dev_max").alias("dev_max"),
        )
        .select(group_col, "cp_period", "n_periods", "total", "dev_max")
    )


def _avg_rank2(df: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """(value, rank2) — DOUBLED average ranks of the values in `df`
    (one row per distinct value; ties get min+max which is integer),
    computed on the value histogram through global_rank_cumsum.  The
    shared rank primitive of mann_whitney_by_group and spearman_rho."""
    vhist = df.groupBy(value_col).agg(F.count("*").cast("long").alias("__cnt"))
    return global_rank_cumsum(
        vhist, [F.col(value_col).asc()], sum_col="__cnt", cum_col="__cum"
    ).select(
        value_col,
        (2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1).alias(out_col),
    )


def spearman_rho(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Tie-aware Spearman rank correlation between two exact-grid
    columns: Pearson on DOUBLED average ranks (integer under ties), so
    every aggregate is an exact BIGINT and rho is one double expression
    from six integers, micro-snapped:

        rho = (n*sab - sa*sb) / sqrt((n*saa - sa^2) * (n*sbb - sb^2))

    The monitoring read behind "does the quality score just track
    length?" — a monotone-association check the Pearson-on-raw-values
    correlation (stats_correlation) can't give.  NULL pairs are
    excluded.  Emits one row (n, rho_micro); NULL rho on a constant
    column via try_divide.

    Scale: two value-histogram rankings through the range-partitioned
    prefix sum + two broadcast-joins back onto the pair frame; the
    moment products that would overflow int64 (n*saa at 10^8+ rows)
    form in doubles from the exact sums."""
    pairs = df.select(a_col, b_col).filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    )
    # NOTE (r13): an explicit localCheckpoint pin on `pairs` (to stop the
    # two rank passes + final join re-deriving the caller's lineage) was
    # A/B-measured and REJECTED: eager 17-39s, lazy 3.5-12s vs 3.7s
    # baseline at sf0.1 — the .rdd materialization path of a scored
    # corpus-grain frame costs far more than the partial re-execution it
    # saves (quality_length_spearman's residual cost stays adjudicated as
    # the two-pass ranking itself).
    ra = _avg_rank2(pairs, a_col, "__ra")
    rb = _avg_rank2(pairs, b_col, "__rb")
    j = pairs.join(ra, a_col).join(rb, b_col)
    m = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__ra").cast("long").alias("__sa"),
        F.sum("__rb").cast("long").alias("__sb"),
        F.sum(F.col("__ra") * F.col("__ra")).cast("long").alias("__saa"),
        F.sum(F.col("__rb") * F.col("__rb")).cast("long").alias("__sbb"),
        F.sum(F.col("__ra") * F.col("__rb")).cast("long").alias("__sab"),
    )
    n = F.col("n").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    saa, sbb, sab = (
        F.col("__saa").cast("double"),
        F.col("__sbb").cast("double"),
        F.col("__sab").cast("double"),
    )
    return m.select(
        "n",
        snap_micro(
            F.try_divide(
                n * sab - sa * sb,
                F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            )
        ).alias("rho_micro"),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_long: Column,
) -> DataFrame:
    """Per-group Gini coefficient of a NONNEGATIVE exact-integer value —
    the inequality read next to supplier_concentration_hhi's
    concentration: how unevenly is revenue spread across a group's
    members.  Standard rank form over values sorted ascending:

        G = (2 * sum r*x - (n+1) * sum x) / (n * sum x)

    Ranks come from a per-group row_number on (x, id) — equal values
    can permute freely without changing sum r*x, so the statistic is
    tie-stable; the id tiebreak just pins the plan.  Numerator and
    denominator are exact BIGINTs (sum r*x stays under 2^63 through
    ~10^5-member groups at cent grain), the division is the only
    double, micro-snapped; an all-zero group emits NULL via
    try_divide.  NULL groups are excluded."""
    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col), F.col(id_col).alias("__id"), value_long.alias("__x")
    )
    w = Window.partitionBy(group_col).orderBy("__x", "__id")
    ranked = base.withColumn("__r", F.row_number().over(w).cast("long"))
    m = ranked.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("__x").cast("long").alias("total"),
        F.sum(F.col("__r") * F.col("__x")).cast("long").alias("__srx"),
    )
    num = (2 * F.col("__srx") - (F.col("n_members") + 1) * F.col("total")).cast(
        "double"
    )
    den = (F.col("n_members") * F.col("total")).cast("double")
    return m.select(
        group_col,
        "n_members",
        "total",
        snap_micro(F.try_divide(num, den)).alias("gini_micro"),
    )


def shannon_entropy_by_group(
    df: DataFrame,
    group_col: str,
    item_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Shannon entropy (nats) of each group's item-type mix — the
    behavioral-diversity read (a user doing one thing has H = 0; uniform
    over k types has H = ln k).  Each -(c/n)*ln(c/n) term snaps to the
    1e-12 grid and integer-sums per group (the bigram_cond_entropy
    discipline), so the scalar is aggregation-order-independent; the
    final rounding to `round_digits` is the only visible double.  NULL
    groups/items excluded; emits (group, n_events, n_items,
    entropy_nats)."""
    base = df.filter(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
    c = base.groupBy(group_col, item_col).agg(F.count("*").cast("long").alias("__c"))
    nper = c.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_items"),
    )
    scale = 1e12
    term = F.floor(
        -(F.col("__c").cast("double") / F.col("n_events"))
        * F.log(F.col("__c").cast("double") / F.col("n_events"))
        * F.lit(scale)
        + F.lit(0.5)
    ).cast("long")
    return (
        c.join(nper, group_col)
        .withColumn("__e", term)
        .groupBy(group_col)
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_items").alias("n_items"),
            F.round(F.sum("__e").cast("double") / F.lit(scale), round_digits).alias(
                "entropy_nats"
            ),
        )
    )


# ln(2) and ln(0.01) as fixed literals: the planner formula must hash-match
# the oracle, and constant-folding ln() through two engines' libm is a
# dependency the repo doesn't otherwise take.
_LN2 = 0.6931471805599453
_LN_P001 = -4.605170185988091  # ln(0.01)


def bloom_parameter_plan(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Bloom-filter sizing per group at a 1% target false-positive rate —
    the planning read run before provisioning the streaming dedup
    filters (streaming/bloom.py): from the EXACT distinct-key count n,

        m_bits   = ceil(-n * ln(p) / ln(2)^2)
        k_hashes = max(1, floor(m/n * ln2 + 0.5))
        fpp      = (1 - exp(-k*n/m))^k   (the realized rate at m, k)

    ln(p) and ln(2) are pinned numeric literals (not engine ln() calls)
    so both engines compute the identical double expression from the
    exact integer n; fpp micro-snaps.  Groups with n = 0 can't occur
    (count-distinct of an existing group is >= 1 after the null filter).

    Scale: one exact count-distinct per group (partial aggregation
    map-side); everything downstream is |groups| rows."""
    base = df.filter(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
    n = base.groupBy(group_col).agg(
        F.countDistinct(key_col).cast("long").alias("n_keys")
    )
    nd = F.col("n_keys").cast("double")
    m_bits = F.ceil(-nd * F.lit(_LN_P001) / (F.lit(_LN2) * F.lit(_LN2))).cast("long")
    out = n.withColumn("m_bits", m_bits)
    md = F.col("m_bits").cast("double")
    k = F.greatest(
        F.lit(1).cast("long"),
        F.floor(md / nd * F.lit(_LN2) + F.lit(0.5)).cast("long"),
    )
    out = out.withColumn("k_hashes", k)
    kd = F.col("k_hashes").cast("double")
    fpp = F.pow(
        F.lit(1.0) - F.exp(-(kd * nd) / F.col("m_bits").cast("double")), kd
    )
    return out.select(
        group_col,
        "n_keys",
        "m_bits",
        "k_hashes",
        snap_micro(fpp).alias("fpp_micro"),
    )


def quantile_normalize_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization of `value_col` ACROSS groups: each row's
    value is replaced by the POOLED value at the same quantile position
    the row occupies within its own group — the batch-effect remover
    (microarray lineage) that forces every group's marginal distribution
    onto the pooled one while preserving within-group order.  The read a
    curation pipeline runs to compare per-source quality/length scores
    on one scale.

    Entirely exact-integer — no interpolation, no doubles:

        rank2_g  = doubled average rank of the value within its group
        target   = ceil(rank2_g * N / (2 * n_g))        (in 1..N)
        norm     = pooled value at inclusive rank `target`

    The pooled rank->value map comes from exploding the value histogram
    cum ranges (sum of counts = N rows, row grain, distributed); the
    per-group ranking windows over each group's value histogram.  Ties
    inside a group share one rank2 and therefore one normalized value.
    NULL groups/values are excluded.  Emits (id, group, value,
    norm_value).

    Scale bound: the target expression multiplies rank2_g (up to ~2*n_g)
    by N in int64, so it overflows once 2*N^2 > 2^63 — total rows N
    must stay below ~2.1e9.  Fine for per-day or per-source
    normalization slices at 100 TB; shard the input (e.g. by date)
    before calling it on a corpus above that row count."""
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(id_col), F.col(group_col), F.col(value_col))

    ghist = base.groupBy(group_col, value_col).agg(
        F.count("*").cast("long").alias("__cnt")
    )
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    granks = ghist.withColumn("__cum_g", F.sum("__cnt").over(wg)).select(
        group_col,
        value_col,
        (
            2 * (F.col("__cum_g") - F.col("__cnt")) + F.col("__cnt") + 1
        ).alias("__rank2"),
    )
    gtot = base.groupBy(group_col).agg(F.count("*").cast("long").alias("__n_g"))

    vhist = base.groupBy(value_col).agg(F.count("*").cast("long").alias("__cnt_all"))
    vcum = global_rank_cumsum(
        vhist, [F.col(value_col).asc()], sum_col="__cnt_all", cum_col="__cum_all"
    )
    pooled = vcum.select(
        F.col(value_col).alias("__norm"),
        F.explode(
            F.sequence(
                F.col("__cum_all") - F.col("__cnt_all") + 1, F.col("__cum_all")
            )
        ).alias("__target"),
    )
    total = base.agg(F.count("*").cast("long").alias("__n_all"))

    tagged = (
        base.join(granks, [group_col, value_col])
        .join(F.broadcast(gtot), group_col)
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__target",
            F.expr("(__rank2 * __n_all + 2 * __n_g - 1) div (2 * __n_g)").cast(
                "long"
            ),
        )
    )
    return tagged.join(pooled, "__target").select(
        id_col,
        group_col,
        value_col,
        F.col("__norm").alias("norm_value"),
    )


def importance_ess_by_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    cap: float = 20.0,
) -> DataFrame:
    """Effective sample size of exp(log-weight) per group — the
    importance-resampling health read: ESS/n near 1 means the group's
    weights are flat (resampling changes little), near 0 means a few
    documents dominate (the resampled set collapses).  Standard
    truncated importance sampling: the ratio caps at `cap` before
    squaring (untruncated ESS is dominated by exactly the outliers it
    is supposed to flag).

        ESS/n = (sum w)^2 / (n * sum w^2)

    `weight_col` must sit on the 1e-6 grid (a dsir_weight); the integer
    is recovered exactly by the +0.5 floor snap-back, each exp(w) snaps
    to the 1e-3 grid (a monitoring granularity that keeps sum w^2 in
    BIGINT range far past 10^6-doc groups), and the two sums are exact
    integers; ESS closes in one double expression, micro-snapped.  NULL
    groups excluded."""
    w_int = F.floor(F.col(weight_col) * F.lit(1e6) + F.lit(0.5))
    w_milli = F.least(
        F.floor(
            F.exp(w_int.cast("double") / F.lit(1e6)) * F.lit(1000.0) + F.lit(0.5)
        ).cast("long"),
        F.lit(int(cap * 1000)).cast("long"),
    )
    g = (
        df.filter(F.col(group_col).isNotNull())
        .select(F.col(group_col), w_milli.alias("__w"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__w").cast("long").alias("__sw"),
            F.sum(F.col("__w") * F.col("__w")).cast("long").alias("__sww"),
        )
    )
    return g.select(
        group_col,
        "n_docs",
        snap_micro(
            F.try_divide(
                F.col("__sw").cast("double") * F.col("__sw").cast("double"),
                F.col("n_docs").cast("double") * F.col("__sww").cast("double"),
            )
        ).alias("ess_micro"),
    )


# Planning constants for the two-sided alpha=5% / 80%-power two-sample
# design: Phi^-1(0.975), Phi^-1(0.80).  Pinned as literals (and folded in
# Python, not the engines) so the oracle sees the identical doubles.
Z_ALPHA_975 = 1.959963984540054
Z_POWER_80 = 0.8416212335729143
TWO_Z_SUM_SQ = 2.0 * (Z_ALPHA_975 + Z_POWER_80) ** 2


def ab_sample_size_plan(
    df: DataFrame,
    group_col: str,
    value_long: Column,
) -> DataFrame:
    """Sample size needed per arm to CONFIRM each observed pairwise
    difference at alpha=5% (two-sided) with 80% power — the experiment-
    planning read run after an exploratory Welch pass ("the A/B pilot
    shows +2.1 cents; how long must the real test run?"):

        n/arm = ceil( 2 * (z_a + z_b)^2 * s_pooled^2 / delta^2 )

    with s_pooled^2 = (var_a + var_b)/2 and delta the observed mean
    difference, from the same exact (n, sum, sumsq) BIGINT moments as
    welch_t_pairs.  z constants are pinned literals folded in Python.
    delta = 0 emits NULL (no finite test distinguishes equal means).
    Emits group_a < group_b with n_a, n_b, delta_micro, n_required."""
    m = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(value_long).cast("long").alias("__s1"),
        F.sum(value_long * value_long).cast("long").alias("__s2"),
    )
    a = m.select(
        F.col(group_col).alias("group_a"),
        F.col("__n").alias("__na"),
        F.col("__s1").alias("__s1a"),
        F.col("__s2").alias("__s2a"),
    )
    b = m.select(
        F.col(group_col).alias("group_b"),
        F.col("__n").alias("__nb"),
        F.col("__s1").alias("__s1b"),
        F.col("__s2").alias("__s2b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    va = F.try_divide(
        na * F.col("__s2a").cast("double")
        - F.col("__s1a").cast("double") * F.col("__s1a").cast("double"),
        na * (na - F.lit(1.0)),
    )
    vb = F.try_divide(
        nb * F.col("__s2b").cast("double")
        - F.col("__s1b").cast("double") * F.col("__s1b").cast("double"),
        nb * (nb - F.lit(1.0)),
    )
    md = F.col("__s1a").cast("double") / na - F.col("__s1b").cast("double") / nb
    sp2 = (va + vb) / F.lit(2.0)
    n_req = F.ceil(F.try_divide(F.lit(TWO_Z_SUM_SQ) * sp2, md * md)).cast("long")
    return pairs.select(
        "group_a",
        "group_b",
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        snap_micro(md).alias("delta_micro"),
        n_req.alias("n_required"),
    )


def kaplan_meier(
    df: DataFrame,
    dur_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator over (duration,
    observed) rows — observed=false is right-censoring (the subject left
    the risk set without the event).  The time-to-event read behind
    "how long until a signup converts", with censoring handled the only
    statistically sound way (dropping censored users biases toward fast
    converters).

    At each distinct EVENT time t (d_t events, n_t at risk = rows with
    duration >= t; censored rows at t count as at-risk at t, the
    standard convention):

        S(t) = prod_{u <= t} (1 - d_u / n_u)

    The product runs in LOG space on the micro grid: each ln(1 - d/n)
    snaps to an integer from the exact (n, d) BIGINTs, the cumulative
    sum is exact, and S materializes once per row as exp(cum/1e6),
    re-snapped.  d = n (the risk set dies out — only possible at the
    last event time) pins S = 0 exactly instead of ln(0).

    Scale: collapses to the duration histogram first; BOTH cumulative
    passes (risk-set countdown, log-survival sum) run through
    global_rank_cumsum, so no unpartitioned window at any cardinality.
    Emits per event time: (t, n_risk, d_events, surv_log_micro,
    surv_micro), surv_log_micro NULL on the S = 0 row."""
    hist = (
        df.groupBy(F.col(dur_col).alias("t"))
        .agg(
            F.sum(F.col(observed_col).cast("long")).alias("__d"),
            F.count("*").cast("long").alias("__tot"),
        )
        .localCheckpoint(eager=False)  # two cumulative consumers + total
    )
    n_all = hist.agg(F.sum("__tot").alias("__n_all"))
    cum = global_rank_cumsum(
        hist, [F.col("t").asc()], sum_col="__tot", cum_col="__cum_tot"
    ).crossJoin(F.broadcast(n_all))
    at_risk = cum.select(
        "t",
        "__d",
        (F.col("__n_all") - (F.col("__cum_tot") - F.col("__tot"))).alias("__n_risk"),
    ).filter(F.col("__d") > 0)
    li = F.when(F.col("__d") == F.col("__n_risk"), F.lit(None)).otherwise(
        F.floor(
            F.log(
                (F.col("__n_risk") - F.col("__d")).cast("double")
                / F.col("__n_risk").cast("double")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
    )
    ev = at_risk.withColumn("__li", li)
    # the d == n_risk row (if any) is the LAST event time: its NULL log
    # term must not poison the cumsum — sum skips NULLs in both engines,
    # and S is pinned to 0 on that row directly.
    sv = global_rank_cumsum(ev, [F.col("t").asc()], sum_col="__li", cum_col="__cum_l")
    surv = F.when(F.col("__d") == F.col("__n_risk"), F.lit(0).cast("long")).otherwise(
        F.floor(
            F.exp(F.col("__cum_l").cast("double") / F.lit(1e6)) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
    )
    return sv.select(
        "t",
        F.col("__n_risk").alias("n_risk"),
        F.col("__d").alias("d_events"),
        F.when(F.col("__d") == F.col("__n_risk"), F.lit(None))
        .otherwise(F.col("__cum_l"))
        .cast("long")
        .alias("surv_log_micro"),
        surv.alias("surv_micro"),
    )


def nelson_aalen(
    df: DataFrame,
    dur_col: str,
    observed_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the SAME (duration,
    observed) frame kaplan_meier consumes — H(t) = sum_{u <= t} d_u/n_u,
    the additive-hazard read whose slope changes localize WHEN the event
    rate shifts (KM's product form shows the survival level, not the
    rate).  Unlike KM it needs no log/exp at all: each step is the exact
    BIGINT floor (d * 1e6) div n_risk, the cumulative sum is exact
    integer arithmetic, so the estimate is bit-exact cross-engine with
    no transcendental anywhere (r12 round: kaplan_meier at stats.py:914
    is the log-space sibling).

    Scale shape is identical to kaplan_meier: collapse to the duration
    histogram, then both cumulative passes (risk-set countdown, hazard
    cumsum) ride global_rank_cumsum — no unpartitioned window at any
    cardinality.  Emits per event time: (t, n_risk, d_events,
    hazard_step_micro, cum_hazard_micro)."""
    hist = (
        df.groupBy(F.col(dur_col).alias("t"))
        .agg(
            F.sum(F.col(observed_col).cast("long")).alias("__d"),
            F.count("*").cast("long").alias("__tot"),
        )
        .localCheckpoint(eager=False)
    )
    n_all = hist.agg(F.sum("__tot").alias("__n_all"))
    cum = global_rank_cumsum(
        hist, [F.col("t").asc()], sum_col="__tot", cum_col="__cum_tot"
    ).crossJoin(F.broadcast(n_all))
    at_risk = cum.select(
        "t",
        "__d",
        (F.col("__n_all") - (F.col("__cum_tot") - F.col("__tot"))).alias("__n_risk"),
    ).filter(F.col("__d") > 0)
    step = F.expr("(__d * 1000000) div __n_risk").cast("long")
    ev = at_risk.withColumn("__step", step)
    cumh = global_rank_cumsum(
        ev, [F.col("t").asc()], sum_col="__step", cum_col="__cum_h"
    )
    return cumh.select(
        "t",
        F.col("__n_risk").alias("n_risk"),
        F.col("__d").alias("d_events"),
        F.col("__step").alias("hazard_step_micro"),
        F.col("__cum_h").cast("long").alias("cum_hazard_micro"),
    )


# ---------------------------------------------------------------------------
# One-way group-difference tests (r11): ANOVA F / eta^2, Brown-Forsythe
# Levene, Kruskal-Wallis H — the multi-group siblings of welch_t_pairs /
# mann_whitney_by_group, from the same exact-BIGINT moment discipline.
# ---------------------------------------------------------------------------


def _oneway_from_moments(per_g: DataFrame) -> DataFrame:
    """One-way ANOVA F and eta^2 from per-group exact moments
    (group, __n long, __s long, __q long) with __s = sum(x), __q =
    sum(x^2) on an integer grid.

    F and eta^2 are scale-invariant, so every intermediate is expressed
    as a FRACTION OF Q (the raw total sum of squares, an exact BIGINT):
    each group contributes S_g^2/(n_g*Q) in [0, 1] (Cauchy-Schwarz),
    computed in IEEE doubles FROM EXACTLY-REPRESENTABLE integers
    (|S_g|, Q < 2^53), micro-snapped, and BIGINT-summed — bounded ints
    regardless of N or value scale (a raw-S^2/n micro grid overflows
    int64 past ~10^4 cents-grain rows), and the group-sum is
    aggregation-order-independent so it matches the SQL oracle
    bit-for-bit.  With g = S^2/(N*Q):

        ssb_frac = sum_g S_g^2/(n_g*Q) - g      sst_frac = 1 - g
        eta2 = ssb_frac / sst_frac
        F    = (ssb_frac/(k-1)) / ((sst_frac - ssb_frac)/(N-k))

    Emits one row: (n_all, n_groups, ssb_frac_micro, sst_frac_micro,
    f_micro, eta2_micro); degenerate inputs (k < 2, N <= k, SSW = 0,
    Q = 0) emit NULL statistics via try_divide.

    Scale bound: exactness needs |S_g| and Q below 2^53 (cents-grain
    sums — shard upstream past ~10^10 rows per call slice)."""
    tot = per_g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("__n").cast("long").alias("n_all"),
        F.sum("__s").cast("long").alias("__ssum"),
        F.sum("__q").cast("long").alias("__qsum"),
    )
    terms = per_g.crossJoin(F.broadcast(tot)).select(
        "n_groups",
        "n_all",
        "__ssum",
        "__qsum",
        F.floor(
            F.try_divide(
                F.col("__s").cast("double") * F.col("__s").cast("double"),
                F.col("__n").cast("double") * F.col("__qsum").cast("double"),
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__t_micro"),
    )
    agg = terms.groupBy("n_groups", "n_all", "__ssum", "__qsum").agg(
        F.sum("__t_micro").cast("long").alias("__tsum_micro")
    )
    nd = F.col("n_all").cast("double")
    grand_micro = F.floor(
        F.try_divide(
            F.col("__ssum").cast("double") * F.col("__ssum").cast("double"),
            nd * F.col("__qsum").cast("double"),
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    a = agg.select(
        "n_all",
        "n_groups",
        (F.col("__tsum_micro") - grand_micro).alias("ssb_frac_micro"),
        (F.lit(1_000_000).cast("long") - grand_micro).alias("sst_frac_micro"),
    )
    k = F.col("n_groups").cast("double")
    n = F.col("n_all").cast("double")
    ssb = F.col("ssb_frac_micro").cast("double") / F.lit(1e6)
    ssw = (F.col("sst_frac_micro") - F.col("ssb_frac_micro")).cast("double") / F.lit(
        1e6
    )
    f = F.try_divide(
        F.try_divide(ssb, k - F.lit(1.0)),
        F.try_divide(ssw, n - k),
    )
    eta2 = F.try_divide(
        F.col("ssb_frac_micro").cast("double"), F.col("sst_frac_micro").cast("double")
    )
    return a.select(
        "n_all",
        "n_groups",
        "ssb_frac_micro",
        "sst_frac_micro",
        snap_micro(f).alias("f_micro"),
        snap_micro(eta2).alias("eta2_micro"),
    )


def oneway_anova_f(df: DataFrame, group_col: str, value_long: Column) -> DataFrame:
    """One-way ANOVA F + eta^2 of `value_long` (exact integer grid,
    e.g. cents) across `group_col` — the parametric 'does the group
    explain the variance' read next to welch_t_pairs' pairwise version.
    NULL groups and NULL values excluded (a NULL value would inflate n
    while contributing nothing to the moments).  See _oneway_from_moments
    for exactness."""
    per_g = (
        df.filter(F.col(group_col).isNotNull() & value_long.isNotNull())
        .select(F.col(group_col).alias("__g"), value_long.cast("long").alias("__v"))
        .groupBy("__g")
        .agg(
            F.count("*").cast("long").alias("__n"),
            F.sum("__v").cast("long").alias("__s"),
            F.sum(F.col("__v") * F.col("__v")).cast("long").alias("__q"),
        )
    )
    return _oneway_from_moments(per_g)


def levene_brown_forsythe(
    df: DataFrame, group_col: str, value_long: Column
) -> DataFrame:
    """Brown-Forsythe Levene test of variance homogeneity across groups:
    one-way ANOVA F on Z = |x - median_g| (the median-centered variant —
    robust to heavy tails, the recommended default).  The per-group
    median is the exact LOWER median (smallest value whose cumulative
    count reaches ceil(n_g/2)) read off the per-group value histogram —
    the cumulative window is bounded by each group's VALUE-GRID
    cardinality, never row count.  Z stays on the integer grid, so the
    downstream moments are exact (see _oneway_from_moments).  NULL
    groups AND values are excluded: a NULL value row would sit at a
    different end of the histogram window's order in Spark (nulls
    first) vs SQL (nulls last), shifting the median cutoff."""
    base = (
        df.filter(F.col(group_col).isNotNull() & value_long.isNotNull())
        .select(F.col(group_col).alias("__g"), value_long.cast("long").alias("__v"))
    )
    hist = base.groupBy("__g", "__v").agg(F.count("*").cast("long").alias("__c"))
    wg = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(wg)).withColumn(
        "__n_g", F.sum("__c").over(Window.partitionBy("__g"))
    )
    med = (
        cum.filter(F.col("__cum") >= F.expr("(__n_g + 1) div 2"))
        .groupBy("__g")
        .agg(F.min("__v").alias("__med"))
    )
    z = base.join(med, "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__med")).alias("__z")
    )
    per_g = z.groupBy("__g").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__z").cast("long").alias("__s"),
        F.sum(F.col("__z") * F.col("__z")).cast("long").alias("__q"),
    )
    return _oneway_from_moments(per_g)


def kruskal_wallis_h(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across ALL groups — the k-sample
    extension of mann_whitney_by_group, from the SAME one-global-
    average-ranking machinery (doubled ranks over the pooled value
    histogram through the range-partitioned prefix sum).

        H = [ 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1) ]
            / [ 1 - sum_v (t^3 - t)/(N^3 - N) ]

    2R_g = sum_v cnt_g(v)*rank2(v) is an exact BIGINT; each group's
    CONTRIBUTION TO H — 12*R_g^2/(n_g*N*(N+1)), an O(N)-bounded
    quantity, NOT the O(N^3) raw R_g^2/n_g term, which overflows the
    int64 micro grid past ~10^4 rows — is a double from exactly-
    representable integers (needs 2R_g < 2^53, i.e. N below ~6.7e7 per
    call slice — shard by period upstream at 100 TB, same bound class
    as quantile_normalize), micro-snapped and BIGINT-summed so group
    aggregation order cannot move the result.  The tie sum t^3 - t
    carries mann_whitney's int64 bound (hottest single value below
    ~2.1e6 occurrences).  Emits one row: (n_all, n_groups, h_micro);
    a single group or an all-tied input yields NULL via try_divide."""
    df = df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
    hist = (
        df.groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    vhist = hist.groupBy(value_col).agg(F.sum("__cnt").alias("__cnt_all"))
    vcum = global_rank_cumsum(
        vhist, [F.col(value_col).asc()], sum_col="__cnt_all", cum_col="__cum_all"
    ).select(
        value_col,
        "__cnt_all",
        (2 * (F.col("__cum_all") - F.col("__cnt_all")) + F.col("__cnt_all") + 1).alias(
            "__rank2"
        ),
    )
    ties = vcum.agg(
        F.sum(
            F.col("__cnt_all") * F.col("__cnt_all") * F.col("__cnt_all")
            - F.col("__cnt_all")
        ).alias("__tie_sum"),
        F.sum("__cnt_all").alias("__n_all"),
    )
    per_g = (
        hist.join(vcum.select(value_col, "__rank2"), value_col)
        .groupBy(group_col)
        .agg(
            F.sum("__cnt").cast("long").alias("__n_g"),
            F.sum(F.col("__cnt") * F.col("__rank2")).cast("long").alias("__r2"),
        )
    )
    npool = F.col("__n_all").cast("double")
    terms = per_g.crossJoin(F.broadcast(ties)).select(
        F.col("__n_g"),
        F.col("__tie_sum"),
        F.col("__n_all"),
        F.floor(
            F.lit(12.0)
            * F.col("__r2").cast("double")
            * F.col("__r2").cast("double")
            / (
                F.lit(4.0)
                * F.col("__n_g").cast("double")
                * npool
                * (npool + F.lit(1.0))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__t_micro"),
    )
    agg = terms.groupBy("__n_all", "__tie_sum").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("__t_micro").cast("long").alias("__tsum_micro"),
    )
    nd = F.col("__n_all").cast("double")
    h_raw = F.col("__tsum_micro").cast("double") / F.lit(1e6) - F.lit(3.0) * (
        nd + F.lit(1.0)
    )
    corr = F.lit(1.0) - F.col("__tie_sum").cast("double") / (nd * nd * nd - nd)
    h = F.try_divide(h_raw, corr)
    degenerate = (F.col("n_groups") < 2) | (F.col("__n_all") < 2)
    return agg.select(
        F.col("__n_all").alias("n_all"),
        "n_groups",
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(snap_micro(h))
        .alias("h_micro"),
    )


def winsorized_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_long: Column,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized mean on the exact integer grid: values below
    the lo_pct-th / above the hi_pct-th percentile are CLAMPED to those
    percentiles (not dropped), then integer-averaged — the robust
    location read next to daily_anomaly_mad's scale read.  Percentiles
    are exact ECDF order statistics (smallest value whose cumulative
    count reaches ceil(p*n/100)) off the per-group value histogram; the
    cumulative window is bounded by value-grid cardinality.  The clamped
    sum is an exact BIGINT, so the mean is one deterministic double
    division, micro-snapped.  NULL groups AND values are excluded (the
    nulls-ordering hazard levene_brown_forsythe documents).  Emits
    (group, n, lo_cents, hi_cents, wmean_micro)."""
    base = (
        df.filter(F.col(group_col).isNotNull() & value_long.isNotNull())
        .select(F.col(group_col).alias("__g"), value_long.cast("long").alias("__v"))
    )
    hist = base.groupBy("__g", "__v").agg(F.count("*").cast("long").alias("__c"))
    wg = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(wg)).withColumn(
        "__n_g", F.sum("__c").over(Window.partitionBy("__g"))
    )
    cuts = cum.groupBy("__g").agg(
        F.max("__n_g").alias("__n"),
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"({lo_pct} * __n_g + 99) div 100"),
                F.col("__v"),
            )
        ).alias("__lo"),
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"({hi_pct} * __n_g + 99) div 100"),
                F.col("__v"),
            )
        ).alias("__hi"),
    )
    clamped = hist.join(F.broadcast(cuts), "__g").select(
        "__g",
        "__n",
        "__lo",
        "__hi",
        (
            F.col("__c")
            * F.greatest(F.least(F.col("__v"), F.col("__hi")), F.col("__lo"))
        ).alias("__w"),
    )
    return (
        clamped.groupBy("__g", "__n", "__lo", "__hi")
        .agg(F.sum("__w").cast("long").alias("__ws"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n"),
            F.col("__lo").alias("lo_cents"),
            F.col("__hi").alias("hi_cents"),
            snap_micro(
                F.col("__ws").cast("double") / F.col("__n").cast("double")
            ).alias("wmean_micro"),
        )
    )


def mann_kendall_by_group(
    df: DataFrame, group_col: str, idx_col: str, value_col: str
) -> DataFrame:
    """Tie-corrected Mann-Kendall trend test per group over an ordered
    series (idx_col an integer period index with no duplicates per
    group, value_col an exact integer measure — cents, counts):

      S     = sum_{i<j} sign(v_j - v_i)                 (exact BIGINT)
      tau_b = S / sqrt((n0 - n1) * n0),  n0 = n(n-1)/2,
              n1 = sum_t t(t-1)/2 over value-tie groups (idx has none)
      var S = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18
      z     = (S -/+ 1) / sqrt(var S)   (continuity-corrected; 0 at S=0)

    The monotone-trend read behind "is this metric drifting" next to
    cusum_changepoint's "where did it jump".  All pair and tie sums are
    exact BIGINTs; tau/z close in doubles at the final projection and
    micro-snap (the daily_revenue_acf discipline).

    Scale shape: the pair frame is a per-group self-join at PERIOD grain
    (calendar-bounded — days, not rows), the same bounded-frame contract
    as the ACF lags; tie counts ride the value histogram."""
    d = df.select(
        F.col(group_col).alias("__g"),
        F.col(idx_col).cast("long").alias("__i"),
        F.col(value_col).cast("long").alias("__v"),
    )
    pairs = (
        d.alias("a")
        .join(d.alias("b"), "__g")
        .filter(F.col("b.__i") > F.col("a.__i"))
        .select(
            "__g",
            F.signum(
                (F.col("b.__v") - F.col("a.__v")).cast("double")
            ).cast("long").alias("__sgn"),
        )
    )
    s = pairs.groupBy("__g").agg(F.sum("__sgn").cast("long").alias("__s"))
    nrec = d.groupBy("__g").agg(F.count("*").cast("long").alias("__n"))
    ties = (
        d.groupBy("__g", "__v")
        .agg(F.count("*").cast("long").alias("__t"))
        .groupBy("__g")
        .agg(
            F.sum(F.expr("__t * (__t - 1) div 2")).cast("long").alias("__n1"),
            F.sum(F.expr("__t * (__t - 1) * (2 * __t + 5)"))
            .cast("long")
            .alias("__tv"),
        )
    )
    m = nrec.join(s, "__g").join(ties, "__g")
    n = F.col("__n").cast("double")
    sd = F.col("__s").cast("double")
    n0 = F.expr("__n * (__n - 1) div 2").cast("double")
    denom = F.sqrt((n0 - F.col("__n1").cast("double")) * n0)
    var_s = (
        n * (n - F.lit(1.0)) * (F.lit(2.0) * n + F.lit(5.0))
        - F.col("__tv").cast("double")
    ) / F.lit(18.0)
    z_num = F.when(F.col("__s") > 0, sd - F.lit(1.0)).when(
        F.col("__s") < 0, sd + F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return m.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n_periods"),
        F.col("__s").alias("s_stat"),
        snap_micro(F.try_divide(sd, denom)).alias("tau_b_micro"),
        snap_micro(F.try_divide(z_num, F.sqrt(var_s))).alias("z_micro"),
    )


def theil_sen_by_group(
    df: DataFrame, group_col: str, idx_col: str, value_col: str
) -> DataFrame:
    """Theil-Sen robust trend slope per group: the LOWER MEDIAN of all
    pairwise slopes (v_j - v_i) / (i_j - i_i) over the ordered series —
    the outlier-proof companion to grouped_regression's OLS slope.

    Exactness: each pair slope is floor((dv * 1e6) / di) — dv*1e6 is an
    exact-integer double (|dv| cents bounded well under 2^53/1e6), the
    division is one correctly-rounded IEEE op, and a non-integer true
    quotient sits >= 1/di >= 1/4096 away from the nearest integer while
    the double error is < 1 ulp (~1e-4 at 1e12), so floor is exact in
    both engines; the median is an order statistic of those BIGINTs
    (row_number at slope grain), no interpolation.

    Scale shape: same calendar-bounded pair frame as mann_kendall (the
    window below partitions by group over period-pair cardinality,
    never row cardinality)."""
    d = df.select(
        F.col(group_col).alias("__g"),
        F.col(idx_col).cast("long").alias("__i"),
        F.col(value_col).cast("long").alias("__v"),
    )
    slopes = (
        d.alias("a")
        .join(d.alias("b"), "__g")
        .filter(F.col("b.__i") > F.col("a.__i"))
        .select(
            "__g",
            F.floor(
                ((F.col("b.__v") - F.col("a.__v")) * F.lit(1_000_000)).cast(
                    "double"
                )
                / (F.col("b.__i") - F.col("a.__i")).cast("double")
            )
            .cast("long")
            .alias("__sl"),
        )
    )
    w = Window.partitionBy("__g").orderBy(F.col("__sl").asc())
    wn = Window.partitionBy("__g")
    ranked = slopes.withColumn("__r", F.row_number().over(w)).withColumn(
        "__np", F.count("*").over(wn)
    )
    return (
        ranked.filter(F.col("__r") == F.expr("(__np + 1) div 2"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__np").cast("long").alias("n_pairs"),
            F.col("__sl").alias("slope_micro"),
        )
    )


def runs_test_by_group(
    df: DataFrame, group_col: str, idx_col: str, value_col: str
) -> DataFrame:
    """Wald-Wolfowitz runs test per group: randomness of the sequence of
    above/below-median signs over the ordered series.  Values equal to
    the (lower) median are dropped (the standard convention); R = number
    of sign runs, and under H0

      mu    = 2 n1 n2 / (n1 + n2) + 1
      var   = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1))
      z     = (R - mu) / sqrt(var)

    The "is the daily metric oscillating or streaky" read that catches
    autocorrelated residuals the mean-level tests miss.  Median is an
    exact order statistic off the per-group value histogram; R counts
    sign changes with a lag over the period index (calendar-bounded
    window); n1/n2/R exact BIGINTs, mu/var/z closed in doubles at the
    final projection and micro-snapped."""
    d = df.select(
        F.col(group_col).alias("__g"),
        F.col(idx_col).cast("long").alias("__i"),
        F.col(value_col).cast("long").alias("__v"),
    )
    hist = d.groupBy("__g", "__v").agg(F.count("*").cast("long").alias("__c"))
    wcum = (
        Window.partitionBy("__g")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("__g")
    med = (
        hist.withColumn("__cum", F.sum("__c").over(wcum))
        .withColumn("__n", F.sum("__c").over(wg))
        .filter(F.col("__cum") >= F.expr("(__n + 1) div 2"))
        .groupBy("__g")
        .agg(F.min("__v").alias("__med"))
    )
    signs = (
        d.join(F.broadcast(med), "__g")
        .filter(F.col("__v") != F.col("__med"))
        .select(
            "__g",
            "__i",
            F.when(F.col("__v") > F.col("__med"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__sgn"),
        )
    )
    wlag = Window.partitionBy("__g").orderBy(F.col("__i").asc())
    runs = signs.withColumn("__prev", F.lag("__sgn").over(wlag)).select(
        "__g",
        "__sgn",
        F.when(
            F.col("__prev").isNull() | (F.col("__prev") != F.col("__sgn")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__new_run"),
    )
    m = runs.groupBy("__g").agg(
        F.sum(F.when(F.col("__sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_above"),
        F.sum(F.when(F.col("__sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
        F.sum("__new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    two_n1n2 = F.lit(2.0) * n1 * n2
    mu = F.try_divide(two_n1n2, nn) + F.lit(1.0)
    var = F.try_divide(
        two_n1n2 * (two_n1n2 - n1 - n2), nn * nn * (nn - F.lit(1.0))
    )
    return m.select(
        F.col("__g").alias(group_col),
        "n_above",
        "n_below",
        "n_runs",
        snap_micro(
            F.try_divide(F.col("n_runs").cast("double") - mu, F.sqrt(var))
        ).alias("z_micro"),
    )


def neyman_allocation_plan(
    df: DataFrame, stratum_col: str, value_long: Column, total_n: int
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a sampling
    budget of total_n rows, allocate n_h proportional to N_h * S_h (the
    stratum's size times its value standard deviation) — the planner a
    pipeline runs before drawing a stratified eval/labeling sample so
    high-variance strata get the labels (companion to
    ab_sample_size_plan, which sizes the experiment; this sizes the
    sample).

    Exactness: per-stratum (n, sum, sum-sq) are exact BIGINT moments;
    N_h*S_h is closed in doubles from those integers with one fixed
    expression shape, micro-snapped to a BIGINT weight, and the
    allocation closes entirely on the integer grid:
    n_h = (total_n * w_h) div sum(w) (floor; the remainder stays
    unallocated rather than introducing a largest-remainder tie-break
    that the oracle would have to replicate).  Degenerate strata
    (n_h=1 or zero variance) carry weight 0 via try_divide; if EVERY
    stratum is degenerate the weight total is 0, so the divisor is
    clamped with greatest(__wt, 1) — every numerator is 0 then, so
    alloc_n degrades to 0 instead of an ANSI DIVIDE_BY_ZERO (the
    lineitem_pareto_abc guard pattern)."""
    d = df.select(F.col(stratum_col).alias("__g"), value_long.alias("__v"))
    m = d.groupBy("__g").agg(
        F.count("*").cast("long").alias("__n"),
        F.sum("__v").cast("long").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).cast("long").alias("__q"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    q = F.col("__q").cast("double")
    sd = F.sqrt(F.try_divide(n * q - s * s, n * (n - F.lit(1.0))))
    wtd = m.select(
        "__g",
        "__n",
        F.coalesce(
            F.floor(n * sd + F.lit(0.5)).cast("long"), F.lit(0).cast("long")
        ).alias("__w"),
    )
    tot = wtd.agg(F.sum("__w").cast("long").alias("__wt"))
    return (
        wtd.crossJoin(F.broadcast(tot))
        .select(
            F.col("__g").alias(stratum_col),
            F.col("__n").alias("n_rows"),
            F.col("__w").alias("weight_scaled"),
            F.expr(f"CAST({total_n} AS BIGINT) * __w div greatest(__wt, CAST(1 AS BIGINT))")
            .cast("long")
            .alias("alloc_n"),
        )
    )


def markov_transition_probs(
    df: DataFrame,
    entity_col: str,
    order_col: Column,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity state
    sequences: for each entity, order its events and count (state ->
    next state) transitions; probabilities are row-normalized counts on
    the exact integer grid (cnt * 1e6 div row_total — both engines
    truncate identically on non-negative BIGINTs).  The session-path
    read behind funnel design: "after a click, what happens next".

    The ordering window partitions by entity (bounded by per-entity
    event counts); the transition matrix is |states|^2-bounded.
    `tiebreak_col` pins a total order under timestamp ties (pass the
    event's unique id)."""
    order_cols = [order_col.asc()]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    trans = (
        df.withColumn("__next", F.lead(state_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("__next").alias("to_state"),
        )
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    return transition_probs_from_counts(trans)


def transition_probs_from_counts(counts: DataFrame) -> DataFrame:
    """Row-normalize a (from_state, to_state, n_trans) count frame to the
    exact integer probability grid — shared by the batch operator above
    and the streaming transition monitor's consumer view
    (streaming/stateful.current_transition_probs), so the two stay
    contract-identical by construction (the CUSUM-twin discipline)."""
    wrow = Window.partitionBy("from_state")
    return counts.withColumn(
        "__row_total", F.sum("n_trans").over(wrow)
    ).select(
        "from_state",
        "to_state",
        "n_trans",
        F.expr("n_trans * 1000000 div __row_total")
        .cast("long")
        .alias("p_micro"),
    )


def exact_percentiles_by_group(
    df: DataFrame,
    group_col: str,
    value_long: Column,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact lower-percentile order statistics per group off the value
    HISTOGRAM (the winsorized_mean_by_group cut discipline: the p-th
    percentile is the smallest value whose cumulative count reaches
    ceil(p*n/100), computed as (p*n + 99) div 100 — pure integers, no
    interpolation doubles anywhere).  Returns (group, n, p<p> ...).

    Scale shape: one map-side-combined histogram aggregation, then a
    window over (group x distinct values) — value-histogram grain, never
    row grain."""
    d = df.select(F.col(group_col).alias("__g"), value_long.alias("__v"))
    hist = d.groupBy("__g", "__v").agg(F.count("*").cast("long").alias("__c"))
    wcum = (
        Window.partitionBy("__g")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy("__g")
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum)).withColumn(
        "__n", F.sum("__c").over(wg)
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in pcts:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") >= F.expr(f"({p} * __n + 99) div 100"),
                    F.col("__v"),
                )
            ).alias(f"p{p}")
        )
    return cum.groupBy("__g").agg(*aggs).withColumnRenamed("__g", group_col)


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-square test of independence between two categoricals plus
    Cramér's V effect size — the r x c generalization of
    keyness_chi2_top_terms' 2x2 form ("are these two labelings
    related at all", the pre-flight before using one column to
    stratify the other).

    Exactness: with n_ij the cell counts, r_i/c_j the margins and n the
    total (all exact BIGINTs over the FULL r x c grid — zero cells
    contribute their expected mass), each cell's statistic is
    (n*n_ij - r_i*c_j)^2 / (n * r_i * c_j): the numerator's operands
    are exact integers in double, the square is one correctly-rounded
    op on identical inputs in both engines, and each cell is
    micro-snapped BEFORE the BIGINT sum so cell order cannot move the
    total.  Output: one row (n, n_rows, n_cols, dof, chi2_micro,
    cramers_v_micro).

    Scale shape: two map-side-combined margin aggregations + one cell
    aggregation; the grid is category-bounded, never row-bounded."""
    d0 = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull()).select(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    )
    cells = d0.groupBy("__a", "__b").agg(F.count("*").cast("long").alias("__nij"))
    rows = d0.groupBy("__a").agg(F.count("*").cast("long").alias("__r"))
    cols = d0.groupBy("__b").agg(F.count("*").cast("long").alias("__c"))
    tot = d0.agg(
        F.count("*").cast("long").alias("__n"),
        F.count_distinct("__a").cast("long").alias("__nr"),
        F.count_distinct("__b").cast("long").alias("__nc"),
    )
    grid = (
        rows.crossJoin(cols)
        .join(cells, ["__a", "__b"], "left")
        .na.fill({"__nij": 0})
        .crossJoin(F.broadcast(tot))
    )
    dlt = (F.col("__n") * F.col("__nij") - F.col("__r") * F.col("__c")).cast("double")
    denom = (
        F.col("__n").cast("double")
        * F.col("__r").cast("double")
        * F.col("__c").cast("double")
    )
    per_cell = grid.select(
        "__n",
        "__nr",
        "__nc",
        snap_micro(dlt * dlt / denom).alias("__chi"),
    )
    agg = per_cell.groupBy("__n", "__nr", "__nc").agg(
        F.sum("__chi").cast("long").alias("__chi2")
    )
    chi2_d = F.col("__chi2").cast("double") / F.lit(1_000_000.0)
    vmin = F.least(F.col("__nr") - 1, F.col("__nc") - 1).cast("double")
    return agg.select(
        F.col("__n").alias("n"),
        F.col("__nr").alias("n_rows"),
        F.col("__nc").alias("n_cols"),
        ((F.col("__nr") - 1) * (F.col("__nc") - 1)).cast("long").alias("dof"),
        F.col("__chi2").alias("chi2_micro"),
        snap_micro(
            F.sqrt(F.try_divide(chi2_d, F.col("__n").cast("double") * vmin))
        ).alias("cramers_v_micro"),
    )


def dp_contribution_clip_plan(
    contribs: DataFrame,
    group_col: str = "event_type",
    count_col: str = "c",
    pct: int = 95,
) -> DataFrame:
    """Per-group contribution-bounding plan for a user-level
    differentially-private count release: pick the clip bound C as the
    exact nearest-rank p{pct} of per-unit contribution counts, then
    report what clipping at C costs — the L1 sensitivity of the clipped
    query IS C (each unit moves the total by at most its bound), and
    clipped_share is the mass the release gives up for it.  The
    calibration step every DP aggregate needs BEFORE noise is drawn
    (noise itself is out of scope: this engine is deterministic; the
    plan is the reproducible part).

    Scale shape: the quantile never sorts row-grain data — contributions
    collapse to a (group, count) HISTOGRAM first (count domain is small:
    events per user per period), the nearest-rank scan is a window over
    that domain-bounded frame, and the clipped totals close from the
    same histogram (sum n_c * least(c, C)).  Everything is exact BIGINT
    arithmetic except the final share, one IEEE division micro-snapped.

    Output per group: (group, clip_bound, n_units, raw_total,
    clipped_total, clipped_share_micro)."""
    hist = contribs.groupBy(
        F.col(group_col).alias("g"), F.col(count_col).cast("long").alias("c")
    ).agg(F.count("*").cast("long").alias("n_c"))
    w = Window.partitionBy("g").orderBy("c")
    tot = hist.groupBy("g").agg(
        F.sum("n_c").cast("long").alias("n_units"),
        F.sum(F.col("n_c") * F.col("c")).cast("long").alias("raw_total"),
    )
    ranked = (
        hist.withColumn(
            "cum", F.sum("n_c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .join(tot, "g")
        .withColumn("target", F.expr(f"({pct} * n_units + 99) div 100"))
    )
    bound = (
        ranked.filter(F.col("cum") >= F.col("target"))
        .groupBy("g")
        .agg(F.min("c").cast("long").alias("clip_bound"))
    )
    clipped = (
        hist.join(bound, "g")
        .groupBy("g", "clip_bound")
        .agg(
            F.sum(F.col("n_c") * F.least(F.col("c"), F.col("clip_bound")))
            .cast("long")
            .alias("clipped_total")
        )
    )
    return (
        clipped.join(tot, "g")
        .select(
            F.col("g").alias(group_col),
            "clip_bound",
            "n_units",
            "raw_total",
            "clipped_total",
            F.floor(
                (F.col("raw_total") - F.col("clipped_total")).cast("double")
                / F.col("raw_total").cast("double")
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("clipped_share_micro"),
        )
    )


def krippendorff_alpha_nominal(
    ratings: DataFrame,
    unit_col: str = "unit",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha (nominal data) over a (unit, rater, label)
    ratings frame — the inter-annotator agreement coefficient that,
    unlike Cohen's kappa (lang_id_kappa's 2-rater read), handles ANY
    number of raters and missing ratings: the labeling-quality gate to
    run before a crowd-labeled training set is trusted.

      D_o = (1/n) * sum_u [ordered disagreeing pairs in u] / (m_u - 1)
      D_e = (n(n-1) - sum_c n_c(n_c-1)) / (n(n-1));  alpha = 1 - D_o/D_e

    with n = total ratings, m_u = ratings in unit u, n_c = label
    marginals.  Every count is an exact BIGINT; the per-unit rational
    d_u/(m_u-1) snaps to the micro grid by EXACT integer floor division
    BEFORE the cross-unit sum (the snap-before-sum discipline — a
    double sum is partition-order-dependent), and the two final closes
    are IEEE divisions, micro-snapped.  Units with m_u < 2 carry no
    pair information and drop from D_o per the standard definition.

    Scale shape: one groupBy (unit, label), one groupBy unit, one
    label-marginal aggregate — all map-side combined; nothing is ever
    rater^2 beyond the per-unit label histogram.  Output one row:
    (n_units, n_ratings, do_micro, de_micro, alpha_micro)."""
    r = ratings.select(
        F.col(unit_col).alias("u"),
        F.col(rater_col).alias("rt"),
        F.col(label_col).alias("lb"),
    ).filter(F.col("u").isNotNull() & F.col("lb").isNotNull())
    per_ul = r.groupBy("u", "lb").agg(F.count("*").cast("long").alias("m_uc"))
    per_u = per_ul.groupBy("u").agg(
        F.sum("m_uc").cast("long").alias("m_u"),
        F.sum(F.col("m_uc") * F.col("m_uc")).cast("long").alias("sq"),
    )
    # ordered disagreeing pairs in u = m_u^2 - sum_c m_uc^2; the
    # 1/(m_u - 1) weight snaps by exact integer division per unit
    do_terms = per_u.filter(F.col("m_u") >= 2).select(
        F.expr(
            "((m_u * m_u - sq) * 1000000) div (m_u - 1)"
        ).cast("long").alias("t_micro"),
        F.col("m_u"),
    )
    do_agg = do_terms.agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum("t_micro").cast("long").alias("do_sum_micro"),
        F.sum("m_u").cast("long").alias("n"),
    )
    marg = (
        r.join(
            per_u.filter(F.col("m_u") >= 2).select("u"), "u", "left_semi"
        )
        .groupBy("lb")
        .agg(F.count("*").cast("long").alias("n_c"))
        .agg(F.sum(F.col("n_c") * (F.col("n_c") - 1)).cast("long").alias("pairs_same"))
    )
    nD = F.col("n").cast("double")
    do = F.col("do_sum_micro").cast("double") / F.lit(1_000_000.0) / nD
    de = (nD * (nD - F.lit(1.0)) - F.col("pairs_same").cast("double")) / (
        nD * (nD - F.lit(1.0))
    )
    snap = lambda c: F.floor(c * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return do_agg.crossJoin(F.broadcast(marg)).select(
        "n_units",
        F.col("n").alias("n_ratings"),
        snap(do).alias("do_micro"),
        snap(de).alias("de_micro"),
        snap(
            F.lit(1.0) - do / F.nullif(de, F.lit(0.0))
        ).alias("alpha_micro"),
    )
