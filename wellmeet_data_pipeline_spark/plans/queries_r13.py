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
