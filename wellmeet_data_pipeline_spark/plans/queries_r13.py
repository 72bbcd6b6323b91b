"""Registry queries, round-13 wave: experimentation & release tooling —
EWMA control chart and Kendall tau-b over the daily-cents series,
overdispersion (variance-to-mean) of event arrivals, Nelson-Aalen
cumulative hazard (the additive sibling of survival_km_conversion),
CUPED variance reduction, Brier-score decomposition and WOE/information
value for the hashed classifier, SCD type-2 dimension history, the DP
contribution-clip plan, prefix-blocked edit-distance near-dup pairs,
HITS hubs/authorities and neighbor-Jaccard link prediction over the
near-dup graph, the streaming-fill file-compaction plan, and
deterministic priority (sequential-Poisson) weighted sampling.

See the package facade plans/queries.py for the registry contract and
queries_core.py's header for the exactness conventions every oracle
pair here follows (micro-grid snaps, BIGINT moments, snap-before-sum
for any double term that must cross an aggregation, no raw \\s)."""

from __future__ import annotations

from wellmeet_data_pipeline_spark.plans.queries_core import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    _NORM_SQL,
    _minhash_sha_ctes,
    _q,
    table,
)
from wellmeet_data_pipeline_spark.plans.queries_curation import _CLS_CTES
from wellmeet_data_pipeline_spark.plans.queries_r12 import _DAILY_SQL, _daily_cents
from wellmeet_data_pipeline_spark.plans.queries_stats import _EVENT_CENTS_SQL
from wellmeet_data_pipeline_spark.operators.experiment import (
    EWMA_L,
    EWMA_LAMBDA_PCT,
    EWMA_WINDOW,
    ewma_weights,
)

# ---------------------------------------------------------------------------
# EWMA control chart over the daily cents series
# ---------------------------------------------------------------------------

_EWMA_WT_VALUES = ", ".join(f"({j}, {w})" for j, w in enumerate(ewma_weights()))
# EWMA sigma factor L * sqrt(lam / (2 - lam)) as ONE python double shared
# by both engines (repr round-trips the exact double; neither engine
# runs sqrt/pow for it)
_EWMA_HALF = repr(EWMA_L * ((EWMA_LAMBDA_PCT / 100.0) / (2.0 - EWMA_LAMBDA_PCT / 100.0)) ** 0.5)


@_q(
    "ewma_control_chart",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT g, di, v, CAST(row_number() OVER (PARTITION BY g ORDER BY di) AS BIGINT) AS rn
      FROM d
    ),
    wt(j, w) AS (VALUES {_EWMA_WT_VALUES}),
    l AS (
      SELECT a.g, a.di, a.v,
             CAST(sum(b.v * wt.w) AS BIGINT) AS num,
             CAST(sum(wt.w) AS BIGINT) AS den
      FROM r a
      JOIN r b ON b.g = a.g AND b.rn <= a.rn AND b.rn > a.rn - {EWMA_WINDOW}
      JOIN wt ON wt.j = a.rn - b.rn
      GROUP BY 1, 2, 3
    ),
    m AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2
      FROM d GROUP BY 1
    ),
    st AS (
      SELECT g,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
                           CAST(0 AS DOUBLE))) AS sigma
      FROM m
    )
    SELECT l.g AS event_type, l.di, l.v,
           CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS ewma_micro,
           CAST(floor((mu + {_EWMA_HALF} * sigma)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS ucl_micro,
           CAST(floor((mu - {_EWMA_HALF} * sigma)
                      * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS lcl_micro,
           CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) > mu + {_EWMA_HALF} * sigma
                OR CAST(num AS DOUBLE) / CAST(den AS DOUBLE) < mu - {_EWMA_HALF} * sigma
                AS INT) AS breach
    FROM l JOIN st ON st.g = l.g
    """,
    "EWMA control chart (lambda 0.20, 3-sigma limits) over each event "
    "type's daily cents total: truncated-window exponential weights on a "
    "1e9 integer grid computed ONCE in Python (pow never runs in either "
    "engine), numerator/denominator exact BIGINT sums, one IEEE division "
    "per point, limits closed from exact moments — the 'is the process "
    "drifting NOW' chart next to Mann-Kendall's whole-series trend test.  "
    "Lag band is row_number-banded like the Mann-Kendall day-pair frame "
    "(calendar-bounded, never rows^2)",
)
def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import ewma_control_chart

    return ewma_control_chart(_daily_cents(spark, sf_dir), "event_type", "di", "v")


# ---------------------------------------------------------------------------
# Kendall tau-b between daily revenue and daily volume
# ---------------------------------------------------------------------------

_DAILY_XY_SQL = f"""
    d2 AS (
      SELECT event_type AS g,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    )"""


def _daily_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return ev.groupBy(
        F.col("event_type"), F.unix_date(F.to_date("ts")).cast("long").alias("di")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("x"),
        F.count("*").cast("long").alias("y"),
    )


@_q(
    "kendall_tau_daily",
    f"""
    WITH {_DAILY_XY_SQL},
    p AS (
      SELECT a.g,
             CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sx,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sy
      FROM d2 a JOIN d2 b ON b.g = a.g AND b.di > a.di
    ),
    c AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
             CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
      FROM p GROUP BY 1
    )
    SELECT g AS event_type, n0, nc, nd,
           CAST(floor(CAST(nc - nd AS DOUBLE)
                / nullif(sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
                         CAST(0 AS DOUBLE))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS tau_b_micro
    FROM c
    """,
    "exact Kendall tau-b association between each event type's daily "
    "cents total and its daily event count: period pairs classified into "
    "concordant/discordant/tied BIGINT counts (the Mann-Kendall day-pair "
    "frame carrying a second metric), one sqrt close, micro-snapped — "
    "the rank-association read completing the correlation family next "
    "to Pearson (stats_correlation) and Spearman (quality_length_"
    "spearman).  All-tied groups emit NULL via nullif",
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import kendall_tau_b

    return kendall_tau_b(_daily_xy(spark, sf_dir), "event_type", "di", "x", "y")


# ---------------------------------------------------------------------------
# Overdispersion index of daily event counts
# ---------------------------------------------------------------------------


@_q(
    "event_overdispersion_index",
    f"""
    WITH {_DAILY_XY_SQL},
    m AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s1,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM d2 GROUP BY 1
    )
    SELECT g AS event_type, n,
           CAST(floor(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS mean_micro,
           CAST(floor((CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                      / nullif(CAST(n AS DOUBLE) - CAST(1 AS DOUBLE),
                               CAST(0 AS DOUBLE))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS var_micro,
           CAST(floor((CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                      / nullif(CAST(n AS DOUBLE) - CAST(1 AS DOUBLE),
                               CAST(0 AS DOUBLE))
                      / nullif(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
                               CAST(0 AS DOUBLE))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS dispersion_micro,
           CAST(floor((CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
                      * ((CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                         / nullif(CAST(n AS DOUBLE) - CAST(1 AS DOUBLE),
                                  CAST(0 AS DOUBLE))
                         / nullif(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE),
                                  CAST(0 AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS chi2_micro
    FROM m
    """,
    "index of dispersion (sample variance / mean) of daily event counts "
    "per type, with the (n-1)*D chi-square statistic testing the Poisson "
    "arrival hypothesis — D >> 1 reads as bursty/contagious arrivals, "
    "D << 1 as rate limiting; the modeling gate to pass BEFORE alert "
    "thresholds assume Poisson noise.  Exact BIGINT count moments, IEEE "
    "closes, micro snaps; degenerate groups (n < 2, zero mean) emit "
    "NULLs via nullif",
)
def q_event_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import overdispersion_index

    return overdispersion_index(
        _daily_xy(spark, sf_dir).select("event_type", F.col("y").alias("c")),
        "event_type",
        "c",
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (the KM duration frame, additive form)
# ---------------------------------------------------------------------------


@_q(
    "survival_na_hazard",
    """
    WITH b AS (
      SELECT user_id, event_type, ts FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s AS (
      SELECT user_id, min(ts) AS s_ts FROM b
      WHERE event_type = 'signup' GROUP BY 1
    ),
    p AS (
      SELECT b.user_id, min(b.ts) AS p_ts
      FROM b JOIN s USING (user_id)
      WHERE b.event_type = 'purchase' AND b.ts >= s.s_ts
      GROUP BY 1
    ),
    l AS (SELECT user_id, max(ts) AS l_ts FROM b GROUP BY 1),
    dur AS (
      SELECT s.user_id,
             CAST((epoch_us(coalesce(p.p_ts, l.l_ts)) - epoch_us(s.s_ts))
                  // 3600000000 AS BIGINT) AS t,
             CAST(p.p_ts IS NOT NULL AS BIGINT) AS obs
      FROM s LEFT JOIN p USING (user_id) JOIN l USING (user_id)
    ),
    hist AS (
      SELECT t, CAST(sum(obs) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS tot
      FROM dur GROUP BY t
    ),
    na AS (SELECT CAST(sum(tot) AS BIGINT) AS n_all FROM hist),
    c AS (
      SELECT t, d, tot, CAST(sum(tot) OVER (ORDER BY t) AS BIGINT) AS cumt
      FROM hist
    ),
    ar AS (
      SELECT t, d,
             CAST((SELECT n_all FROM na) - (cumt - tot) AS BIGINT) AS n_risk
      FROM c WHERE d > 0
    ),
    ev AS (
      SELECT t, d, n_risk, CAST((d * 1000000) // n_risk AS BIGINT) AS st FROM ar
    )
    SELECT t, n_risk, d AS d_events, st AS hazard_step_micro,
           CAST(sum(st) OVER (ORDER BY t) AS BIGINT) AS cum_hazard_micro
    FROM ev
    """,
    "Nelson-Aalen cumulative hazard of signup-to-purchase conversion on "
    "the hour grid — the SAME duration/censoring frame as "
    "survival_km_conversion, closed additively: each hazard step is the "
    "exact BIGINT floor (d * 1e6) div n_risk and the cumulative sum is "
    "exact integer arithmetic, so the estimator carries NO transcendental "
    "at all (KM runs in log space).  Slope changes localize WHEN the "
    "conversion rate shifts; KM shows the level.  Risk-set countdown and "
    "hazard cumsum both ride the range-partitioned two-pass prefix sum",
)
def q_survival_na_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import nelson_aalen

    b = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    s = (
        b.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        b.join(s, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("s_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    last = b.groupBy("user_id").agg(F.max("ts").alias("l_ts"))
    dur = (
        s.join(p, "user_id", "left")
        .join(last, "user_id")
        .select(
            F.expr(
                "(unix_micros(coalesce(p_ts, l_ts)) - unix_micros(s_ts))"
                " div 3600000000"
            )
            .cast("long")
            .alias("__t"),
            F.col("p_ts").isNotNull().cast("long").alias("__obs"),
        )
    )
    return nelson_aalen(dur, "__t", "__obs")


# ---------------------------------------------------------------------------
# SCD type-2 dimension history from the event log
# ---------------------------------------------------------------------------


@_q(
    "scd2_user_state",
    """
    WITH b AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    ch AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM b
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id FROM ch
      WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type AS state, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS version,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL AS INT) AS is_current
    FROM runs
    """,
    "SCD type-2 dimension history of each user's event-type state: "
    "consecutive same-state observations collapse into versioned "
    "validity ranges with effective_from/effective_to and an is_current "
    "flag — the warehouse-standard history build next to "
    "cdc_latest_state's latest-only apply.  All windows partition BY "
    "USER (frame = one user's history, bounded by update frequency, "
    "never table-proportional); order is the deterministic (ts, "
    "event_id) pair so same-instant updates version stably",
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.windows import scd2_history

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return scd2_history(ev, "user_id", "event_type", "ts", "event_id").select(
        "user_id",
        "state",
        "effective_from",
        "effective_to",
        "version",
        "is_current",
    )


# ---------------------------------------------------------------------------
# DP contribution-clip plan
# ---------------------------------------------------------------------------


@_q(
    "dp_contribution_clip",
    """
    WITH c0 AS (
      SELECT event_type AS g, user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    hist AS (SELECT g, c, CAST(count(*) AS BIGINT) AS n_c FROM c0 GROUP BY 1, 2),
    tot AS (
      SELECT g, CAST(sum(n_c) AS BIGINT) AS n_units,
             CAST(sum(n_c * c) AS BIGINT) AS raw_total
      FROM hist GROUP BY 1
    ),
    rk AS (
      SELECT h.g, h.c, h.n_c,
             CAST(sum(h.n_c) OVER (PARTITION BY h.g ORDER BY h.c) AS BIGINT) AS cum,
             t.n_units,
             CAST((95 * t.n_units + 99) // 100 AS BIGINT) AS target
      FROM hist h JOIN tot t USING (g)
    ),
    bd AS (
      SELECT g, CAST(min(c) AS BIGINT) AS clip_bound
      FROM rk WHERE cum >= target GROUP BY 1
    ),
    cl AS (
      SELECT h.g, b.clip_bound,
             CAST(sum(h.n_c * least(h.c, b.clip_bound)) AS BIGINT) AS clipped_total
      FROM hist h JOIN bd b USING (g) GROUP BY 1, 2
    )
    SELECT cl.g AS event_type, cl.clip_bound, t.n_units, t.raw_total,
           cl.clipped_total,
           CAST(floor(CAST(t.raw_total - cl.clipped_total AS DOUBLE)
                      / CAST(t.raw_total AS DOUBLE)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS clipped_share_micro
    FROM cl JOIN tot t USING (g)
    """,
    "contribution-bounding plan for a user-level DP count release per "
    "event type: clip bound = exact nearest-rank p95 of per-(user, day) "
    "contribution counts, reported with what clipping costs "
    "(clipped_share) — the bound IS the release's L1 sensitivity, the "
    "calibration every DP aggregate runs before noise is drawn (noise "
    "itself is out of scope: the plan is the deterministic part).  The "
    "quantile never sorts row-grain data: contributions collapse to a "
    "(group, count) histogram whose domain is small, and the clipped "
    "totals close from the same histogram — exact BIGINTs throughout, "
    "one IEEE division micro-snapped",
)
def q_dp_contribution_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import dp_contribution_clip_plan

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    contribs = ev.groupBy(
        F.col("event_type"),
        F.col("user_id"),
        F.unix_date(F.to_date("ts")).cast("long").alias("di"),
    ).agg(F.count("*").cast("long").alias("c"))
    return dp_contribution_clip_plan(contribs, "event_type", "c", pct=95)


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------


@_q(
    "cuped_adjusted_metric",
    f"""
    WITH e0 AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             {_EVENT_CENTS_SQL} AS cents
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
    ),
    sp AS (SELECT CAST((min(di) + max(di)) // 2 AS BIGINT) AS mid FROM e0),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(coalesce(sum(CASE WHEN di <= mid THEN cents END), 0) AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN di > mid THEN cents END), 0) AS BIGINT) AS y
      FROM e0 CROSS JOIN sp GROUP BY 1, 2
    ),
    pooled AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM u
    ),
    g AS (
      SELECT (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
             / nullif(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
                      CAST(0 AS DOUBLE)) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
      FROM pooled
    ),
    a AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
      FROM u GROUP BY 1
    ),
    cl AS (
      SELECT arm, n,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vy,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vx,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cxy
      FROM a
    )
    SELECT arm, n,
           CAST(floor(my * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS mean_y_micro,
           CAST(floor((my - theta * (mx - xbar))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS mean_yadj_micro,
           CAST(floor((CAST(1 AS DOUBLE)
                       - (vy - CAST(2 AS DOUBLE) * theta * cxy
                          + theta * theta * vx)
                         / nullif(vy, CAST(0 AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS var_reduction_micro
    FROM cl CROSS JOIN g
    """,
    "CUPED variance reduction (Deng et al. WSDM'13) on per-user cents: "
    "pre-period spend (first half of the calendar, split at the exact "
    "midpoint day) is the covariate, post-period spend the metric, theta "
    "= cov/var pooled over all users, arms assigned deterministically by "
    "user_id parity.  Per-arm adjusted means and the variance-reduction "
    "ratio close from ONE set of exact BIGINT moments (the adjusted "
    "metric is affine in (x, y), so no second pass); IEEE closes, micro "
    "snaps — the experiment-readout primitive the A/B family "
    "(ab_sample_size_plan, event_welch_ttest) was missing",
)
def q_cuped_adjusted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import cuped_adjusted

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    e0 = ev.select(
        "user_id",
        F.unix_date(F.to_date("ts")).cast("long").alias("di"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    sp = e0.agg(
        F.expr("(min(di) + max(di)) div 2").cast("long").alias("mid")
    )
    per_user = (
        e0.crossJoin(F.broadcast(sp))
        .groupBy("user_id", (F.col("user_id") % 2).cast("long").alias("arm"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("di") <= F.col("mid"), F.col("cents"))),
                F.lit(0),
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("di") > F.col("mid"), F.col("cents"))),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
    )
    return cuped_adjusted(per_user, "arm", "x", "y")


# ---------------------------------------------------------------------------
# Classifier release gates: Brier decomposition + WOE / information value
# (share classifier_auc's hashed-score frame; _CLS_CTES imported above)
# ---------------------------------------------------------------------------

_SC_SQL = """
    sc AS (
      SELECT doc_id,
             CAST(floor(CAST(s AS DOUBLE) / (CAST(32768 AS DOUBLE) * n_tokens)
                        * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS si
      FROM cls_agg
    )"""


def _labeled_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, si, y): the classifier_auc score frame — micro-grid
    hashed-linear score + is-English label."""
    from wellmeet_data_pipeline_spark.operators.scoring import (
        hashed_linear_score,
        model_weights_table,
    )

    d = table(spark, sf_dir, "documents")
    scored = hashed_linear_score(d, model_weights_table(spark)).select(
        "doc_id", F.round(F.col("logit") * F.lit(1e6)).cast("long").alias("si")
    )
    return scored.join(
        d.select("doc_id", (F.col("lang") == "en").cast("long").alias("y")),
        "doc_id",
    )


@_q(
    "brier_decomposition",
    f"""
    WITH {_CLS_CTES},
    {_SC_SQL},
    lab AS (
      SELECT CAST((sc.si + 1000000) // 2 AS BIGINT) AS p,
             CAST(d.lang = 'en' AS BIGINT) AS y
      FROM sc JOIN documents d USING (doc_id)
    ),
    pbin AS (
      SELECT least(9, CAST(floor(CAST(p * 10 AS DOUBLE)
                                 / CAST(1000000 AS DOUBLE)) AS INT)) AS bin,
             p, y
      FROM lab
    ),
    binned AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS nk, CAST(sum(p) AS BIGINT) AS sp,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(p * p) AS BIGINT) AS spp,
             CAST(sum(p * y) AS BIGINT) AS spy
      FROM pbin GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(sy) AS BIGINT) AS sy_all,
             CAST(sum(sp) AS BIGINT) AS sp_all, CAST(sum(spp) AS BIGINT) AS spp_all,
             CAST(sum(spy) AS BIGINT) AS spy_all
      FROM binned
    ),
    per_bin AS (
      SELECT CAST(floor(CAST(nk AS DOUBLE)
                 * (CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) / CAST(1000000 AS DOUBLE)
                    - CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE))
                 * (CAST(sp AS DOUBLE) / CAST(nk AS DOUBLE) / CAST(1000000 AS DOUBLE)
                    - CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE))
                 * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS rel_term_micro,
             CAST(floor(CAST(nk AS DOUBLE)
                 * (CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE)
                    - CAST(t.sy_all AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(nk AS DOUBLE)
                    - CAST(t.sy_all AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS res_term_micro
      FROM binned CROSS JOIN tot t
    ),
    terms AS (
      SELECT CAST(sum(rel_term_micro) AS BIGINT) AS rel_sum_micro,
             CAST(sum(res_term_micro) AS BIGINT) AS res_sum_micro
      FROM per_bin
    )
    SELECT t.n,
           CAST(rel_sum_micro // t.n AS BIGINT) AS reliability_micro,
           CAST(res_sum_micro // t.n AS BIGINT) AS resolution_micro,
           CAST(floor(CAST(t.sy_all AS DOUBLE) / CAST(t.n AS DOUBLE)
                      * (CAST(1 AS DOUBLE)
                         - CAST(t.sy_all AS DOUBLE) / CAST(t.n AS DOUBLE))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS uncertainty_micro,
           CAST(floor((CAST(t.spp_all AS DOUBLE)
                       - CAST(2000000 AS DOUBLE) * CAST(t.spy_all AS DOUBLE)
                       + CAST(1000000000000 AS DOUBLE) * CAST(t.sy_all AS DOUBLE))
                      / CAST(1000000000000 AS DOUBLE) / CAST(t.n AS DOUBLE)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS brier_micro
    FROM tot t CROSS JOIN terms
    """,
    "Murphy decomposition of the hashed classifier's Brier score "
    "(reliability - resolution + uncertainty over 10 fixed probability "
    "bins, plus the exact unbinned Brier) against the is-English label — "
    "the proper-scoring-rule gate next to classifier_auc (rank quality) "
    "and calibration_ece (binned |gap|): REL reads miscalibration, RES "
    "discrimination, UNC label entropy.  Probabilities are the affine "
    "micro-grid map of the bounded score; all bin moments exact BIGINTs; "
    "per-bin double terms snap to micro BEFORE the cross-bin sum (float "
    "addition doesn't associate across partitions)",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import brier_decomposition

    lab = _labeled_scores(spark, sf_dir).select(
        F.expr("(si + 1000000) div 2").cast("long").alias("p_micro"), "y"
    )
    return brier_decomposition(lab, "p_micro", "y")


@_q(
    "woe_information_value",
    f"""
    WITH {_CLS_CTES},
    {_SC_SQL},
    lab AS (
      SELECT sc.si, CAST(d.lang = 'en' AS BIGINT) AS y
      FROM sc JOIN documents d USING (doc_id)
    ),
    pbin AS (
      SELECT least(9, CAST(floor(CAST((si + 1000000) * 10 AS DOUBLE)
                                 / CAST(2000000 AS DOUBLE)) AS INT)) AS bin,
             y
      FROM lab
    ),
    binned AS (
      SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM pbin GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_pos) AS BIGINT) AS p, CAST(sum(n_neg) AS BIGINT) AS n
      FROM binned
    ),
    per_bin AS (
      SELECT bin, n_pos, n_neg,
             CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               CAST(floor(ln((CAST(n_pos AS DOUBLE) * CAST(t.n AS DOUBLE))
                             / (CAST(n_neg AS DOUBLE) * CAST(t.p AS DOUBLE)))
                    * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             END AS woe_micro,
             CASE WHEN n_pos > 0 AND n_neg > 0 THEN
               CAST(floor((CAST(n_pos AS DOUBLE) / CAST(t.p AS DOUBLE)
                           - CAST(n_neg AS DOUBLE) / CAST(t.n AS DOUBLE))
                          * ln((CAST(n_pos AS DOUBLE) * CAST(t.n AS DOUBLE))
                               / (CAST(n_neg AS DOUBLE) * CAST(t.p AS DOUBLE)))
                    * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS iv_term_micro
      FROM binned CROSS JOIN tot t
    ),
    iv AS (SELECT CAST(sum(iv_term_micro) AS BIGINT) AS iv_micro FROM per_bin)
    SELECT bin, n_pos, n_neg, woe_micro, iv.iv_micro
    FROM per_bin CROSS JOIN iv
    """,
    "weight-of-evidence binning + information value of the hashed "
    "classifier score against the is-English label — the credit-scoring-"
    "standard separability read (IV < 0.02 useless, > 0.5 suspicious) "
    "completing the eval family: AUC ranks, ECE calibrates, WOE/IV "
    "localizes WHERE in the score range the separation lives.  Counts "
    "exact BIGINT; ln closes snap to micro (the qld/keyness precedent); "
    "per-bin IV terms snap BEFORE the cross-bin sum; one-class bins emit "
    "NULL woe and contribute 0 per the standard zero-cell convention",
)
def q_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.scoring import woe_information_value

    return woe_information_value(_labeled_scores(spark, sf_dir), "si", "y")


# ---------------------------------------------------------------------------
# Dup-graph directional centrality: HITS hubs/authorities (integer grid)
# ---------------------------------------------------------------------------


def _hits_oracle(iters: int) -> str:
    g = 1_000_000
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""ar{k} AS MATERIALIZED (
      SELECT e.v, CAST(sum(h.h) AS BIGINT) AS a_raw
      FROM e JOIN h{k - 1} h ON h.node = e.u GROUP BY 1
    ),
    am{k} AS (SELECT greatest(max(a_raw), 1) AS mx FROM ar{k}),
    a{k} AS MATERIALIZED (
      SELECT n.node, CAST((coalesce(r.a_raw, 0) * {g}) // m.mx AS BIGINT) AS a
      FROM nodes n LEFT JOIN ar{k} r ON r.v = n.node CROSS JOIN am{k} m
    ),
    hr{k} AS MATERIALIZED (
      SELECT e.u, CAST(sum(a.a) AS BIGINT) AS h_raw
      FROM e JOIN a{k} a ON a.node = e.v GROUP BY 1
    ),
    hm{k} AS (SELECT greatest(max(h_raw), 1) AS mx FROM hr{k}),
    h{k} AS MATERIALIZED (
      SELECT n.node, CAST((coalesce(r.h_raw, 0) * {g}) // m.mx AS BIGINT) AS h
      FROM nodes n LEFT JOIN hr{k} r ON r.u = n.node CROSS JOIN hm{k} m
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_minhash_sha_ctes()},
    e AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
      FROM pairs WHERE id_a <> id_b
    ),
    nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
    h0 AS MATERIALIZED (SELECT node, CAST({g} AS BIGINT) AS h FROM nodes),
    {chain}
    SELECT h.node, h.h AS hub_micro, a.a AS auth_micro
    FROM h{iters} h JOIN a{iters} a USING (node)
    """


@_q(
    "dup_graph_hits",
    _hits_oracle(2),
    "2-iteration HITS hubs/authorities over the MinHash-LSH near-dup "
    "graph oriented older-doc -> newer-doc, computed entirely on a 1e6 "
    "BIGINT grid with max-normalization by integer floor division (the "
    "pagerank_integer treatment; Spark div == DuckDB // on non-negative "
    "operands) so the oracle unrolls the IDENTICAL iterations — the "
    "directional read undirected PageRank can't give: authority mass "
    "accumulates on heavily-RE-duplicated late copies, hub mass on the "
    "early templates that spawned them.  Joins the dup-graph family on "
    "the shared sha edge frame; per-iteration two edge joins + two "
    "groupBy sums, shuffle-linear in edges",
)
def q_dup_graph_hits(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        hits_integer,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return hits_integer(edges, iters=2)


# ---------------------------------------------------------------------------
# Dup-graph link prediction: neighbor Jaccard over 2-hop non-edges
# ---------------------------------------------------------------------------


@_q(
    "dup_link_prediction",
    f"""
    WITH {_minhash_sha_ctes()},
    e_all AS MATERIALIZED (
      SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
      FROM pairs WHERE id_a <> id_b
    ),
    held AS MATERIALIZED (SELECT a, b FROM e_all WHERE (a * 31 + b) % 5 = 0),
    e AS MATERIALIZED (SELECT a, b FROM e_all WHERE (a * 31 + b) % 5 <> 0),
    und AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
    paths AS (
      SELECT l.a, r.c FROM (SELECT v AS m, u AS a FROM und) l
      JOIN (SELECT u AS m, v AS c FROM und) r USING (m)
      WHERE l.a < r.c
    ),
    cmn AS (
      SELECT a, c, CAST(count(*) AS BIGINT) AS common FROM paths GROUP BY 1, 2
    ),
    non_adj AS (
      SELECT cmn.a, cmn.c, cmn.common FROM cmn
      LEFT JOIN e ON e.a = cmn.a AND e.b = cmn.c
      WHERE e.a IS NULL
    ),
    scored AS (
      SELECT n.a AS id_a, n.c AS id_b, n.common,
             CAST(da.deg + dc.deg - n.common AS BIGINT) AS union_deg,
             CAST((n.common * 1000000) // (da.deg + dc.deg - n.common) AS BIGINT)
               AS jaccard_micro
      FROM non_adj n
      JOIN deg da ON da.u = n.a
      JOIN deg dc ON dc.u = n.c
    )
    SELECT s.id_a, s.id_b, s.common, s.union_deg, s.jaccard_micro,
           CAST(coalesce(h.one, 0) AS INT) AS held_out
    FROM scored s
    LEFT JOIN (SELECT a, b, 1 AS one FROM held) h
      ON h.a = s.id_a AND h.b = s.id_b
    ORDER BY s.jaccard_micro DESC, s.id_a ASC, s.id_b ASC
    LIMIT 50
    """,
    "neighbor-Jaccard link-prediction HOLDOUT EVAL over the near-dup "
    "graph: deterministically hold out ~1/5 of the edges ((a*31+b)%5), "
    "score every 2-hop pair non-adjacent in the REMAINING graph by "
    "|shared dup-neighbors|/|union|, keep the exact top-50, and flag "
    "which predictions recover a held-out true edge — precision@k of "
    "'would neighborhood overlap find the edges the banding missed', "
    "the recall-side QC lsh_quality_metrics' in-band precision can't "
    "see.  (On the full graph the prediction set is EMPTY — verified "
    "dup clusters are cliques — which is why the measurable form is "
    "the holdout eval.)  Two-hop path join bounded by the sum-of-deg^2 "
    "the LSH verify already pays (the triangle_counts shape), one anti "
    "join, exact BIGINT scores, one integer floor division; top-k is a "
    "TakeOrdered with a total (jaccard, id_a, id_b) tie order",
)
def q_dup_link_prediction(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        link_prediction_jaccard,
        minhash_lsh_candidates_sha,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return link_prediction_jaccard(edges, top_k=50, holdout_mod=5)


# ---------------------------------------------------------------------------
# Streaming-fill file compaction plan
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000


@_q(
    "file_compaction_plan",
    f"""
    WITH s AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS sz FROM documents
      WHERE source IS NOT NULL AND doc_id IS NOT NULL AND n_chars IS NOT NULL
    ),
    c AS (
      SELECT source, sz,
             CAST(coalesce(sum(sz) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  // {_COMPACT_TARGET} AS BIGINT) AS bin
      FROM s
    )
    SELECT source, bin, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(sz) AS BIGINT) AS bin_bytes,
           CAST((CAST(sum(sz) AS BIGINT) * 1000000) // {_COMPACT_TARGET} AS BIGINT)
             AS fill_micro
    FROM c GROUP BY 1, 2
    """,
    "streaming-fill compaction plan over the documents table: within "
    "each source, walk docs in id order and open a new output file "
    "every time the running size crosses the target — bin = exclusive-"
    "cumsum div target, the one-pass deterministic window form of "
    "first-fit bin packing (true greedy needs sequential state; this "
    "parallelizes per partition and both engines agree exactly).  The "
    "small-file compaction read every lakehouse table schedules: which "
    "items rewrite together, how full each output lands (fill > 1e6 "
    "marks split candidates).  One partitioned window + one groupBy, "
    "integer arithmetic throughout",
)
def q_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sharding import file_compaction_plan

    d = table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    return file_compaction_plan(d, "source", "doc_id", "n_chars", _COMPACT_TARGET)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (priority / sequential Poisson)
# ---------------------------------------------------------------------------


@_q(
    "priority_sample_docs",
    """
    WITH k0 AS (
      SELECT doc_id AS k, CAST(n_chars AS BIGINT) AS w FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
    ),
    hx AS (
      SELECT k, w, sha256(concat_ws('|', 'ps1', CAST(k AS VARCHAR))) AS h FROM k0
    ),
    u AS (
      SELECT k, w,
             CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) AS BIGINT) * 268435456
           + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
           + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
           + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
           + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) AS h32
      FROM hx
    ),
    q AS (
      SELECT k, w,
             (CAST(h32 + 1 AS DOUBLE) / CAST(4294967296 AS DOUBLE))
               / CAST(w AS DOUBLE) AS q
      FROM u
    ),
    top AS (SELECT k, w, q FROM q ORDER BY q ASC, k ASC LIMIT 100)
    SELECT CAST(row_number() OVER (ORDER BY q ASC, k ASC) AS BIGINT) AS rank,
           k AS doc_id, w AS n_chars,
           CAST(floor(q * CAST(1000000000000000000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS priority_atto
    FROM top
    """,
    "deterministic size-weighted document sample by PRIORITY SAMPLING "
    "(Ohlsson sequential Poisson / Duffield-Lund-Thorup): u drawn from a "
    "salted sha256 of the key, priority q = u/w, keep the k = 100 "
    "smallest — inclusion probability ~ min(1, w/tau), the estimator "
    "behind weighted reservoir sampling, realized reproducibly (re-runs "
    "re-select the SAME sample; new items never reshuffle survivors).  "
    "One IEEE division per row (the u^(1/w) exponential-keys variant "
    "needs pow, which engines round differently), TakeOrdered top-k, "
    "priorities on the 1e-18 atto grid because q spans ~1e-10/w .. 1/w",
)
def q_priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sharding import priority_sample

    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("n_chars").isNotNull()
        & (F.col("n_chars") > 0)
    )
    return priority_sample(d, "doc_id", "n_chars", k=100, salt="ps1")


# ---------------------------------------------------------------------------
# Prefix-blocked edit-distance near-dup pairs
# ---------------------------------------------------------------------------


@_q(
    "edit_distance_neardup",
    f"""
    WITH nn AS (
      SELECT doc_id, {_NORM_SQL} AS nrm FROM documents WHERE text IS NOT NULL
    ),
    base AS (
      SELECT doc_id AS id, substr(nrm, 1, 10) AS blk, substr(nrm, 1, 100) AS cmp
      FROM nn WHERE length(substr(nrm, 1, 10)) > 0
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.cmp, b.cmp) AS BIGINT) AS edit_dist
    FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.cmp, b.cmp) <= 5
    """,
    "prefix-blocked edit-distance near-dup pairs over normalized "
    "document text: block on the first 10 characters (one hash-"
    "partitioned equi-join, no cross join), verify with exact JVM-side "
    "levenshtein over the first 100 characters, keep distance <= 5 — "
    "the high-PRECISION dedup pass that separates 'same words' (what "
    "Jaccard/MinHash sees) from 'same bytes, small edits' (OCR noise, "
    "template fills).  The prefix pigeonhole is documented: pairs "
    "differing inside their first 10 chars belong to the LSH candidates "
    "instead (the deletion_neighborhood_link topology with a prefix "
    "block); block skew is the dup clusters' own quadratic, the same "
    "one their LSH verify already pays",
)
def q_edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import normalized_text
    from wellmeet_data_pipeline_spark.operators.linkage import edit_distance_neardup

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", normalized_text("text").alias("__norm"))
    )
    return edit_distance_neardup(
        d, "__norm", "doc_id", prefix_len=10, cmp_len=100, max_dist=5
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join by prefix filtering (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------


@_q(
    "jaccard_prefix_join",
    f"""
    WITH nn AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words
      FROM documents WHERE text IS NOT NULL
    ),
    tk AS (
      SELECT doc_id AS id, unnest(
        list_distinct(list_transform(range(1, greatest(len(words) - 2, 0) + 1),
                                     i -> array_to_string(words[i:i+2], ' ')))
      ) AS tok
      FROM nn
    ),
    dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY 1),
    sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1),
    rk AS (
      SELECT t.id, t.tok, s.n,
             row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS rk
      FROM tk t JOIN dfc d USING (tok) JOIN sz s USING (id)
    ),
    pre AS (SELECT id, tok FROM rk WHERE rk <= n - (4 * n + 4) // 5 + 1),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM pre a JOIN pre b USING (tok) WHERE a.id < b.id
    ),
    itr AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS inter
      FROM cand c
      JOIN tk x ON x.id = c.id_a
      JOIN tk y ON y.id = c.id_b AND y.tok = x.tok
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.inter,
           CAST(sa.n + sb.n - i.inter AS BIGINT) AS union_n,
           CAST((i.inter * 1000000) // (sa.n + sb.n - i.inter) AS BIGINT)
             AS jaccard_micro
    FROM itr i JOIN sz sa ON sa.id = i.id_a JOIN sz sb ON sb.id = i.id_b
    WHERE i.inter * 5 >= 4 * (sa.n + sb.n - i.inter)
    """,
    "EXACT 3-shingle-set similarity self-join at Jaccard >= 0.8 by prefix "
    "filtering (AllPairs/PPJoin, Bayardo WWW'07): under the global "
    "df-ascending shingle order, similar sets MUST share a shingle in their "
    "first n - ceil(0.8n) + 1 tokens, so candidates come from one "
    "equi-join on RARE prefix tokens and the verify is an exact "
    "cross-multiplied Jaccard — the provably-COMPLETE counterpart of "
    "MinHash-LSH (which trades completeness for probability; "
    "dedup_threshold_sweep measures exactly what that trade costs).  "
    "Integer arithmetic throughout; per-doc rank window is doc-bounded; "
    "no cross join",
)
def q_jaccard_prefix_join(
    spark: SparkSession, sf_dir: str, shared_shingle_base: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_join,
        shingles_df,
    )

    # `shared_shingle_base` (r14, bench SHINGLE_BASE sharing): the
    # session-shared DISTINCT (doc_id, shingle) 3-gram frame — exactly
    # the `t` frame prefix_filter_jaccard_join derives itself (its first
    # step is .distinct() over these rows), so the shared path is
    # row-identical by construction (pinned by
    # tests/test_shared_shingle_base.py); the standalone path below is
    # what the driver's correctness runs execute.  The text-IS-NOT-NULL
    # filter is subsumed: normalized_text(NULL) splits to no words, so
    # NULL-text docs contribute no shingles on either path.
    if shared_shingle_base is not None:
        toks = shared_shingle_base.select(
            "doc_id", F.col("shingle").alias("tok")
        )
        return prefix_filter_jaccard_join(
            toks, threshold_num=4, threshold_den=5, id_col="doc_id",
            tok_col="tok", assume_distinct=True,
        )
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = shingles_df(d, "text", "doc_id", n=3).select(
        "doc_id", F.col("shingle").alias("tok")
    )
    return prefix_filter_jaccard_join(
        toks, threshold_num=4, threshold_den=5, id_col="doc_id", tok_col="tok"
    )


# ---------------------------------------------------------------------------
# First/last-touch revenue attribution
# ---------------------------------------------------------------------------


@_q(
    "revenue_attribution_touch",
    """
    WITH conv AS (
      SELECT user_id AS u, ts AS cts, event_id AS cid,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL AND value IS NOT NULL
    ),
    tch AS (
      SELECT user_id AS u, ts AS tts, event_id AS tid, event_type AS channel
      FROM events
      WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
        AND ts IS NOT NULL
    ),
    j AS (
      SELECT c.cts, c.cid, c.v, t.tts, t.tid, t.channel
      FROM conv c LEFT JOIN tch t
        ON t.u = c.u AND t.tts <= c.cts AND t.tts > c.cts - INTERVAL 7 DAY
    ),
    p AS (
      SELECT cid, v, channel,
             row_number() OVER (PARTITION BY cid
               ORDER BY tts ASC NULLS LAST, tid ASC NULLS LAST) AS rf,
             row_number() OVER (PARTITION BY cid
               ORDER BY tts DESC NULLS LAST, tid DESC NULLS LAST) AS rl
      FROM j
    ),
    lab AS (
      SELECT 'first' AS model, coalesce(channel, 'direct') AS channel, cid, v
      FROM p WHERE rf = 1
      UNION ALL
      SELECT 'last', coalesce(channel, 'direct'), cid, v FROM p WHERE rl = 1
    )
    SELECT model, channel, CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(sum(v) AS BIGINT) AS attributed_cents
    FROM lab GROUP BY 1, 2
    """,
    "first-touch vs last-touch revenue attribution: every purchase "
    "credits its cents to the user's earliest / latest click-or-view "
    "inside a 7-day lookback ('direct' when none) — the two bookends of "
    "the attribution-model family, downstream of the funnel queries, "
    "deciding channel budgets.  One banded user equi-join (pair volume "
    "= in-window touch density, never |touches| x |purchases|), one "
    "window per conversion with the deterministic (ts, event_id) order, "
    "integer cents end-to-end",
)
def q_revenue_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import touch_attribution

    ev = table(spark, sf_dir, "events")
    conv = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    tch = ev.filter(
        F.col("event_type").isin("click", "view")
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    ).select("user_id", "ts", "event_id", F.col("event_type").alias("channel"))
    return touch_attribution(
        tch, conv, "user_id", "ts", "event_id", "channel", "cents", lookback_days=7
    )


# ---------------------------------------------------------------------------
# Dedup normalization ladder (exact -> casefold -> punct-strip -> homoglyph)
# ---------------------------------------------------------------------------

from wellmeet_data_pipeline_spark.functions.text import (  # noqa: E402
    CONFUSABLE_FROM,
    CONFUSABLE_TO,
)


@_q(
    "dedup_normalization_ladder",
    f"""
    WITH base AS (
      SELECT source, text, lower(text) AS cased, {_NORM_SQL} AS norm
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT sha256(text)) AS BIGINT) AS d_exact,
           CAST(count(DISTINCT sha256(cased)) AS BIGINT) AS d_cased,
           CAST(count(DISTINCT sha256(norm)) AS BIGINT) AS d_norm,
           CAST(count(DISTINCT sha256(
             translate(norm, '{CONFUSABLE_FROM}', '{CONFUSABLE_TO}')))
             AS BIGINT) AS d_folded
    FROM base GROUP BY 1
    """,
    "dedup normalization ladder per source: distinct-content counts at "
    "four aggressiveness rungs — exact bytes, casefolded, the repo's "
    "dedup normalization (lowercase + punct strip + whitespace "
    "collapse), and homoglyph-folded (Cyrillic/Greek/lookalike "
    "codepoints mapped to Basic Latin via ONE shared translate map) — "
    "the 'how much duplication does each rung unlock' audit that "
    "decides which normalization the exact-dedup key should hash, and "
    "the spam-evasion read (confusable substitution defeats L0-L2).  "
    "One groupBy with sha-keyed distincts, map-side combined",
)
def q_dedup_normalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.functions.text import (
        fold_confusables,
        normalized_text,
    )

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select(
            "source",
            "text",
            F.lower(F.col("text")).alias("cased"),
            normalized_text("text").alias("norm"),
        )
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(F.sha2(F.col("text"), 256)).cast("long").alias("d_exact"),
        F.countDistinct(F.sha2(F.col("cased"), 256)).cast("long").alias("d_cased"),
        F.countDistinct(F.sha2(F.col("norm"), 256)).cast("long").alias("d_norm"),
        F.countDistinct(F.sha2(fold_confusables(F.col("norm")), 256))
        .cast("long")
        .alias("d_folded"),
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha over synthetic annotators
# ---------------------------------------------------------------------------

_KRIPP_LANGS = "['de', 'en', 'es', 'fr', 'zh']"


def _kripp_rater_sql(r: int) -> str:
    noise_pct = 2 + 2 * r  # rater 0: 20%, 1: 40%, 2: 60% noise
    return f"""
      SELECT doc_id AS unit, {r} AS rater,
             CASE WHEN h % 10 < {noise_pct}
                  THEN list_extract({_KRIPP_LANGS}, ((h // 10) % 5) + 1)
                  ELSE lang END AS label
      FROM (
        SELECT doc_id, lang,
               CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
                  AS BIGINT) AS h
        FROM (
          SELECT doc_id, lang,
                 sha256(concat_ws('|', CAST(doc_id AS VARCHAR), '{r}')) AS hx
          FROM documents WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        )
      )"""


@_q(
    "krippendorff_alpha",
    f"""
    WITH ratings AS (
      {_kripp_rater_sql(0)}
      UNION ALL
      {_kripp_rater_sql(1)}
      UNION ALL
      {_kripp_rater_sql(2)}
    ),
    per_ul AS (
      SELECT unit, label, CAST(count(*) AS BIGINT) AS m_uc
      FROM ratings GROUP BY 1, 2
    ),
    per_u AS (
      SELECT unit, CAST(sum(m_uc) AS BIGINT) AS m_u,
             CAST(sum(m_uc * m_uc) AS BIGINT) AS sq
      FROM per_ul GROUP BY 1
    ),
    do_terms AS (
      SELECT CAST(((m_u * m_u - sq) * 1000000) // (m_u - 1) AS BIGINT) AS t_micro,
             m_u
      FROM per_u WHERE m_u >= 2
    ),
    do_agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(t_micro) AS BIGINT) AS do_sum_micro,
             CAST(sum(m_u) AS BIGINT) AS n
      FROM do_terms
    ),
    marg AS (
      SELECT CAST(sum(n_c * (n_c - 1)) AS BIGINT) AS pairs_same FROM (
        SELECT CAST(count(*) AS BIGINT) AS n_c
        FROM ratings r
        JOIN (SELECT unit FROM per_u WHERE m_u >= 2) k USING (unit)
        GROUP BY r.label
      )
    )
    SELECT n_units, n AS n_ratings,
           CAST(floor(CAST(do_sum_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
                      / CAST(n AS DOUBLE)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS do_micro,
           CAST(floor((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
                       - CAST(pairs_same AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS de_micro,
           CAST(floor((CAST(1 AS DOUBLE)
                       - (CAST(do_sum_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
                          / CAST(n AS DOUBLE))
                         / nullif((CAST(n AS DOUBLE)
                                   * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
                                   - CAST(pairs_same AS DOUBLE))
                                  / (CAST(n AS DOUBLE)
                                     * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))),
                                  CAST(0 AS DOUBLE)))
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS alpha_micro
    FROM do_agg CROSS JOIN marg
    """,
    "Krippendorff's alpha (nominal) over three deterministic synthetic "
    "annotators of the documents' language labels (sha-derived noise at "
    "20/40/60% per rater) — the many-rater agreement coefficient "
    "completing the labeling-eval family next to lang_id_kappa's "
    "2-rater Cohen read: the gate a crowd-labeled training set passes "
    "before it is trusted.  Per-unit disagreement rationals snap by "
    "exact integer division BEFORE the cross-unit sum; marginals exact "
    "BIGINT; two IEEE closes, micro-snapped",
)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import krippendorff_alpha_nominal

    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("lang").isNotNull()
    )
    langs = F.array(*[F.lit(x) for x in ["de", "en", "es", "fr", "zh"]])
    frames = []
    for r in range(3):
        noise_pct = 2 + 2 * r
        h = F.conv(
            F.substring(
                F.sha2(
                    F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(str(r))),
                    256,
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("long")
        frames.append(
            d.select(
                F.col("doc_id").alias("unit"),
                F.lit(r).alias("rater"),
                F.when(
                    h % 10 < noise_pct,
                    F.element_at(langs, ((h / 10).cast("long") % 5 + 1).cast("int")),
                )
                .otherwise(F.col("lang"))
                .alias("label"),
            )
        )
    ratings = frames[0].unionAll(frames[1]).unionAll(frames[2])
    return krippendorff_alpha_nominal(ratings, "unit", "rater", "label")


# ---------------------------------------------------------------------------
# Ratio-metric delta CI + sample-ratio-mismatch gate (experiment family)
# ---------------------------------------------------------------------------


@_q(
    "ratio_metric_delta_ci",
    f"""
    WITH u AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                    THEN {_EVENT_CENTS_SQL} END), 0) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, user_id
    ),
    m AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
      FROM u GROUP BY 1
    ),
    cl AS (
      SELECT arm, n,
             CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), CAST(0 AS DOUBLE)) AS r,
             sqrt(greatest(
               (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                - CAST(2 AS DOUBLE)
                  * (CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), CAST(0 AS DOUBLE)))
                  * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                + (CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), CAST(0 AS DOUBLE)))
                  * (CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), CAST(0 AS DOUBLE)))
                  * (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
               / nullif(CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)),
                        CAST(0 AS DOUBLE)),
               CAST(0 AS DOUBLE))) AS se
      FROM m
    )
    SELECT arm, n,
           CAST(floor(r * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS ratio_micro,
           CAST(floor(se * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS se_micro,
           CAST(floor((r - CAST(1.96 AS DOUBLE) * se)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS lo_micro,
           CAST(floor((r + CAST(1.96 AS DOUBLE) * se)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS hi_micro
    FROM cl
    """,
    "per-arm ratio metric (purchase cents per event) with its "
    "delta-method z-interval — the experimentation read for the metric "
    "class where unit-level averaging is wrong because units carry "
    "unequal denominators (revenue/session, CTR): var(R) = (var_x - "
    "2R cov + R^2 var_y)/(n ybar^2) closed from ONE exact BIGINT moment "
    "set per arm; sqrt/divisions are the only doubles, micro-snapped.  "
    "Completes the A/B family next to cuped_adjusted_metric (unit "
    "metrics) and event_welch_ttest (mean differences)",
)
def q_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import ratio_metric_delta_ci

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    per_user = ev.groupBy(
        (F.col("user_id") % 2).cast("long").alias("arm"), F.col("user_id")
    ).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100, 0).cast("long"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("x"),
        F.count("*").cast("long").alias("y"),
    )
    return ratio_metric_delta_ci(per_user, "arm", "x", "y", z_times_1000=1960)


@_q(
    "srm_check",
    """
    WITH assign AS (
      SELECT DISTINCT user_id, CAST(user_id % 2 AS BIGINT) AS arm
      FROM events WHERE user_id IS NOT NULL
    ),
    counts AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_obs FROM assign GROUP BY 1
    ),
    expd(arm, exp_share_micro) AS (VALUES (0, 500000), (1, 500000)),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM counts),
    per_arm AS (
      SELECT coalesce(c.arm, e.arm) AS arm,
             CAST(coalesce(c.n_obs, 0) AS BIGINT) AS n_obs,
             CAST(coalesce(e.exp_share_micro, 0) AS BIGINT) AS exp_share_micro,
             t.n_tot
      FROM counts c FULL JOIN expd e ON e.arm = c.arm CROSS JOIN tot t
    ),
    terms AS (
      SELECT arm, n_obs, exp_share_micro,
             CAST(floor(
               (CAST(n_obs AS DOUBLE)
                - CAST(n_tot AS DOUBLE) * CAST(exp_share_micro AS DOUBLE)
                  / CAST(1000000 AS DOUBLE))
               * (CAST(n_obs AS DOUBLE)
                  - CAST(n_tot AS DOUBLE) * CAST(exp_share_micro AS DOUBLE)
                    / CAST(1000000 AS DOUBLE))
               / nullif(CAST(n_tot AS DOUBLE) * CAST(exp_share_micro AS DOUBLE)
                        / CAST(1000000 AS DOUBLE), CAST(0 AS DOUBLE))
               * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS chi2_term_micro
      FROM per_arm
    ),
    total AS (
      SELECT CAST(sum(chi2_term_micro) AS BIGINT) AS chi2_total_micro FROM terms
    )
    SELECT t.arm, t.n_obs, t.exp_share_micro, t.chi2_term_micro,
           tt.chi2_total_micro,
           CAST(tt.chi2_total_micro > 3841459 AS INT) AS srm_flag
    FROM terms t CROSS JOIN total tt
    """,
    "sample-ratio-mismatch gate on the deterministic user_id-parity "
    "assignment vs the designed 50/50 split: chi-square of observed arm "
    "counts with the exact chi2(1) 95% critical value on the micro grid "
    "— THE first validity check on any experiment readout (a biased "
    "assignment invalidates every downstream metric).  Per-arm terms "
    "snap before the cross-arm sum; one arm-grain aggregate",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.experiment import srm_check

    assign = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", (F.col("user_id") % 2).cast("long").alias("arm"))
        .distinct()
    )
    return srm_check(assign, "arm", expected_micro={0: 500_000, 1: 500_000})
