"""Registry queries, round-12 wave: time-series trend/randomness tests
(Mann-Kendall, Theil-Sen, Wald-Wolfowitz runs), session-path Markov
transitions, Neyman stratified-sampling allocation, the t-closeness
release audit (completing the k-anonymity / l-diversity family),
integer PageRank over the near-dup graph, query-likelihood Dirichlet
retrieval (the LM sibling of BM25), and the SFT loss-mask budget plan.

See the package facade plans/queries.py for the registry contract and
queries_core.py's header for the exactness conventions every oracle
pair here follows (micro-grid snaps, BIGINT moments, no raw \\s)."""

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
from wellmeet_data_pipeline_spark.plans.queries_retrieval import (  # noqa: F401
    _CONV_SQL,
    _RETRIEVAL_QT_VALUES,
    _RETRIEVAL_QUERIES,
    _conv_frame,
)
from wellmeet_data_pipeline_spark.plans.queries_stats import _EVENT_CENTS_SQL


# ---------------------------------------------------------------------------
# Daily event-type cents series (the daily_revenue_acf frame, shared by
# the three time-series tests below).  Rows with NULL type/ts/value are
# dropped BEFORE the day aggregation on both sides, so a day whose every
# value is NULL vanishes rather than carrying a NULL total.
# ---------------------------------------------------------------------------

_DAILY_SQL = f"""
    d AS (
      SELECT event_type AS g,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
             CAST(sum({_EVENT_CENTS_SQL}) AS BIGINT) AS v
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    )"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return ev.groupBy(
        F.col("event_type"), F.unix_date(F.to_date("ts")).cast("long").alias("di")
    ).agg(F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("v"))


@_q(
    "daily_revenue_mann_kendall",
    f"""
    WITH {_DAILY_SQL},
    p AS (
      SELECT a.g,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
      FROM d a JOIN d b ON b.g = a.g AND b.di > a.di
    ),
    s AS (SELECT g, CAST(sum(sgn) AS BIGINT) AS s FROM p GROUP BY 1),
    n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (
      SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tv
      FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS t FROM d GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT n.g AS event_type, n.n AS n_periods, s.s AS s_stat,
           CAST(floor(CAST(s.s AS DOUBLE)
                / nullif(sqrt((CAST(n.n * (n.n - 1) // 2 AS DOUBLE)
                               - CAST(t.n1 AS DOUBLE))
                              * CAST(n.n * (n.n - 1) // 2 AS DOUBLE)), 0)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS tau_b_micro,
           CAST(floor((CASE WHEN s.s > 0 THEN CAST(s.s AS DOUBLE) - 1
                            WHEN s.s < 0 THEN CAST(s.s AS DOUBLE) + 1
                            ELSE CAST(0 AS DOUBLE) END)
                / nullif(sqrt((CAST(n.n AS DOUBLE) * (CAST(n.n AS DOUBLE) - 1)
                               * (2 * CAST(n.n AS DOUBLE) + 5)
                               - CAST(t.tv AS DOUBLE)) / 18), 0)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS z_micro
    FROM n JOIN s ON s.g = n.g JOIN t ON t.g = n.g
    """,
    "tie-corrected Mann-Kendall monotone-trend test of each event "
    "type's daily cents total (S from exact pairwise sign sums over the "
    "calendar-bounded day-pair frame, tau-b and the continuity-corrected "
    "z closed in doubles from BIGINT tie sums and micro-snapped) — the "
    "'is this metric drifting' read next to cusum_changepoint's 'where "
    "did it jump'.  Single-day groups drop on both sides (no pairs)",
)
def q_daily_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import mann_kendall_by_group

    return mann_kendall_by_group(
        _daily_cents(spark, sf_dir), "event_type", "di", "v"
    )


@_q(
    "daily_revenue_theil_sen",
    f"""
    WITH {_DAILY_SQL},
    p AS (
      SELECT a.g,
             CAST(floor(CAST((b.v - a.v) * 1000000 AS DOUBLE)
                        / CAST(b.di - a.di AS DOUBLE)) AS BIGINT) AS sl
      FROM d a JOIN d b ON b.g = a.g AND b.di > a.di
    ),
    r AS (
      SELECT g, sl,
             row_number() OVER (PARTITION BY g ORDER BY sl ASC) AS rk,
             CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS np
      FROM p
    )
    SELECT g AS event_type, np AS n_pairs, sl AS slope_micro
    FROM r WHERE rk = (np + 1) // 2
    """,
    "Theil-Sen robust trend slope per event type: the lower median of "
    "all pairwise day-slopes (cents/day on the micro grid; each slope "
    "one exact floor — the quotient sits >= 1/365 from integer "
    "boundaries while the double error is ~1e-4 ulp, so both engines "
    "floor identically).  The outlier-proof companion to "
    "brand_price_regression's OLS slope",
)
def q_daily_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import theil_sen_by_group

    return theil_sen_by_group(_daily_cents(spark, sf_dir), "event_type", "di", "v")


@_q(
    "daily_revenue_runs_test",
    f"""
    WITH {_DAILY_SQL},
    h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
    cw AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM h
    ),
    med AS (SELECT g, min(v) AS med FROM cw WHERE cum >= (n + 1) // 2 GROUP BY 1),
    sg AS (
      SELECT d.g, d.di, CASE WHEN d.v > m.med THEN 1 ELSE -1 END AS sgn
      FROM d JOIN med m ON m.g = d.g WHERE d.v <> m.med
    ),
    rn AS (
      SELECT g, sgn,
             CASE WHEN lag(sgn) OVER (PARTITION BY g ORDER BY di ASC)
                       IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS new_run
      FROM sg
    ),
    m2 AS (
      SELECT g,
             CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
             CAST(sum(new_run) AS BIGINT) AS n_runs
      FROM rn GROUP BY 1
    )
    SELECT g AS event_type, n_above, n_below, n_runs,
           CAST(floor((CAST(n_runs AS DOUBLE)
                 - (2 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                    / nullif(CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE), 0)
                    + 1))
                / nullif(sqrt(
                    2 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                    * (2 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                       - CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE))
                    / nullif((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                             * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                             * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)
                                - 1), 0)), 0)
                * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
             AS z_micro
    FROM m2
    """,
    "Wald-Wolfowitz runs test of each event type's daily cents series: "
    "above/below-median signs (exact lower median off the value "
    "histogram, equal-to-median days dropped — the standard convention), "
    "runs counted with one calendar-bounded lag, z from the exact "
    "(n_above, n_below, n_runs) integers.  Catches streaky/oscillating "
    "residuals the mean-level tests miss",
)
def q_daily_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import runs_test_by_group

    return runs_test_by_group(_daily_cents(spark, sf_dir), "event_type", "di", "v")


@_q(
    "event_markov_transitions",
    """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS o, event_id, event_type
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    t AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY o ASC, event_id ASC) AS to_state
      FROM s
    ),
    c AS (
      SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_trans
      FROM t WHERE to_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n_trans,
           CAST(n_trans * 1000000
                // sum(n_trans) OVER (PARTITION BY from_state) AS BIGINT)
             AS p_micro
    FROM c
    """,
    "first-order Markov transition matrix over per-user event "
    "sequences ('after a click, what happens next' — the session-path "
    "read behind funnel design): per-user lead() ordered by microsecond "
    "timestamp with event_id tie-break (Spark reads the nanos parquet "
    "truncated to micros, so the oracle orders by epoch_us too), counts "
    "row-normalized on the exact integer grid.  Transition matrix is "
    "|states|^2-bounded; the ordering window is per-user-bounded",
)
def q_event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import markov_transition_probs

    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    return markov_transition_probs(
        ev, "user_id", F.unix_micros(F.col("ts")), "event_type", tiebreak_col="event_id"
    )


@_q(
    "stratified_sample_plan",
    f"""
    WITH m AS (
      SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      FROM (SELECT event_type, {_EVENT_CENTS_SQL} AS c FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL)
      GROUP BY 1
    ),
    w AS (
      SELECT g, n,
             coalesce(CAST(floor(CAST(n AS DOUBLE)
               * sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / nullif(CAST(n AS DOUBLE)
                               * (CAST(n AS DOUBLE) - 1), 0))
               + CAST(0.5 AS DOUBLE)) AS BIGINT), 0) AS w
      FROM m
    ),
    t AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w)
    SELECT g AS event_type, n AS n_rows, w AS weight_scaled,
           CAST(CAST(1000 AS BIGINT) * w // wt AS BIGINT) AS alloc_n
    FROM w CROSS JOIN t
    """,
    "Neyman-optimal stratified sampling allocation of a 1000-row "
    "labeling budget across event types (n_h proportional to N_h * S_h "
    "from exact BIGINT moments; the per-stratum weight micro-snapped "
    "BEFORE the cross-stratum sum so summation order cannot move it; "
    "the allocation closes on the integer grid with floor division) — "
    "the sample-design planner next to ab_sample_size_plan",
)
def q_stratified_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.stats import neyman_allocation_plan

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    return neyman_allocation_plan(
        ev, "event_type", F.round(F.col("value") * 100, 0).cast("long"), 1000
    )


@_q(
    "t_closeness_audit",
    """
    WITH c0 AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS sv
      FROM customer WHERE c_acctbal IS NOT NULL
    ),
    gh AS (SELECT c_mktsegment, c_nationkey, sv, CAST(count(*) AS BIGINT) AS c
           FROM c0 GROUP BY 1, 2, 3),
    dom AS (SELECT sv, CAST(count(*) AS BIGINT) AS cg FROM c0 GROUP BY 1),
    grp AS (SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
            FROM c0 GROUP BY 1, 2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
                   CAST(count(DISTINCT sv) AS BIGINT) AS m FROM c0),
    grid AS (
      SELECT g.c_mktsegment, g.c_nationkey, g.n, d.sv, d.cg,
             coalesce(h.c, 0) AS c
      FROM grp g CROSS JOIN dom d
      LEFT JOIN gh h ON h.c_mktsegment = g.c_mktsegment
                    AND h.c_nationkey = g.c_nationkey AND h.sv = d.sv
    ),
    cum AS (
      SELECT c_mktsegment, c_nationkey, n,
             sum(c) OVER (PARTITION BY c_mktsegment, c_nationkey
                          ORDER BY sv ROWS UNBOUNDED PRECEDING) AS cum_c,
             sum(cg) OVER (PARTITION BY c_mktsegment, c_nationkey
                           ORDER BY sv ROWS UNBOUNDED PRECEDING) AS cum_g,
             row_number() OVER (PARTITION BY c_mktsegment, c_nationkey
                                ORDER BY sv ASC) AS r
      FROM grid
    ),
    st AS (
      SELECT c_mktsegment, c_nationkey, n, nn, m,
             CAST(abs(cum_c * nn - cum_g * n) AS BIGINT) AS num
      FROM cum CROSS JOIN tot WHERE r < m
    ),
    e AS (
      SELECT c_mktsegment, c_nationkey, n, nn, m, CAST(sum(num) AS BIGINT) AS s
      FROM st GROUP BY 1, 2, 3, 4, 5
    ),
    f AS (
      SELECT c_mktsegment, c_nationkey, n AS group_size,
             CAST(floor(CAST(s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(m AS DOUBLE) - CAST(1.0 AS DOUBLE))
                  * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS emd_micro
      FROM e
    )
    SELECT * FROM f WHERE emd_micro > 100000
    """,
    "t-closeness release audit (t=0.1) over the (segment, nation) "
    "quasi-identifier groups vs the balance-band sensitive attribute — "
    "the third privacy gate after k_anonymity_audit and "
    "l_diversity_audit: ordered-attribute Earth Mover's Distance as the "
    "mean |cumP - cumQ| over the banded domain, every step one exact "
    "BIGINT bilinear form, one double close + micro snap per group.  "
    "Grid is (groups x domain)-bounded, never row-bounded",
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.projections import t_closeness_audit

    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return t_closeness_audit(
        c, ["c_mktsegment", "c_nationkey"], "bal_band", t_micro=100_000
    )


def _pagerank_oracle(iters: int) -> str:
    g = 1_000_000_000_000
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""it{k} AS (
      SELECT e.v AS u, CAST(sum((85 * p.pr) // (100 * p.deg)) AS BIGINT) AS im
      FROM e2 e JOIN pr{k - 1} p ON p.u = e.u GROUP BY 1
    ),
    pr{k} AS (
      SELECT p.u, p.deg, p.n,
             CAST((15 * CAST({g} AS BIGINT)) // (100 * p.n)
                  + coalesce(i.im, 0) AS BIGINT) AS pr
      FROM pr{k - 1} p LEFT JOIN it{k} i ON i.u = p.u
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_minhash_sha_ctes()},
    e2 AS (
      SELECT id_a AS u, id_b AS v FROM pairs WHERE id_a <> id_b
      UNION ALL
      SELECT id_b, id_a FROM pairs WHERE id_a <> id_b
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e2 GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    pr0 AS (
      SELECT u, deg, n, CAST(CAST({g} AS BIGINT) // n AS BIGINT) AS pr
      FROM deg CROSS JOIN nn
    ),
    {chain}
    SELECT u AS node, pr AS pr_micro12 FROM pr{iters}
    """


@_q(
    "dup_graph_pagerank",
    _pagerank_oracle(4),
    "4-iteration PageRank over the MinHash-LSH near-dup graph, computed "
    "entirely on a 1e-12 BIGINT grid (damping 85/100 by integer floor "
    "division, which Spark div and DuckDB // evaluate identically on "
    "non-negative operands) so the SQL oracle unrolls the IDENTICAL "
    "iterations — centrality ranks template/boilerplate hubs the "
    "cluster-survivor logic should not crown canonical.  Joins the "
    "dup-graph family on the shared sha edge frame; per-iteration cost "
    "is one edge join + one groupBy, shuffle-linear in edges",
)
def q_dup_graph_pagerank(
    spark: SparkSession, sf_dir: str, shared_lsh_edges: DataFrame | None = None
) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates_sha,
        pagerank_integer,
    )

    d = table(spark, sf_dir, "documents")
    edges = (
        shared_lsh_edges
        if shared_lsh_edges is not None
        else minhash_lsh_candidates_sha(d)
    )
    return pagerank_integer(edges, iters=4)


@_q(
    "qld_topk",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS term FROM documents
    ),
    tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tk GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    qt(query_id, term) AS (VALUES {_RETRIEVAL_QT_VALUES}),
    cf AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS cf
      FROM tf JOIN (SELECT DISTINCT term FROM qt) USING (term) GROUP BY 1
    ),
    tot AS (SELECT CAST(coalesce(sum(dl), 0) AS BIGINT) AS total_tok FROM dl),
    nq AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_q
      FROM qt JOIN cf USING (term) GROUP BY 1
    ),
    mt AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor(ln(CAST(1 AS DOUBLE)
                   + CAST(tf.tf * t.total_tok AS DOUBLE)
                     / CAST(2000 * cf.cf AS DOUBLE))
                  * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)
               AS mi
      FROM qt JOIN tf USING (term) JOIN cf USING (term) CROSS JOIN tot t
    ),
    ms AS (SELECT query_id, doc_id, CAST(sum(mi) AS BIGINT) AS mtc
           FROM mt GROUP BY 1, 2),
    sc AS (
      SELECT ms.query_id, ms.doc_id,
             CAST(ms.mtc + nq.n_q
                  * CAST(floor(ln(CAST(2000 AS DOUBLE)
                                  / CAST(dl.dl + 2000 AS DOUBLE))
                       * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    AS BIGINT) AS BIGINT) AS score_int
      FROM ms JOIN dl USING (doc_id) JOIN nq USING (query_id)
    )
    SELECT CAST(query_id AS INTEGER) AS query_id, doc_id,
           CAST(score_int AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score,
           CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT query_id, doc_id, score_int,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_int DESC, doc_id ASC) AS rnk
      FROM sc)
    WHERE rnk <= 10
    """,
    "query-likelihood Dirichlet-smoothed retrieval top-10 (Zhai-"
    "Lafferty, mu=2000) — the language-modeling ranking tier next to "
    "bm25_topk, from the SAME one-pass token index: sparse matched "
    "term-likelihoods plus a length-only Dirichlet term, each ln "
    "micro-snapped BEFORE the BIGINT sum (the bm25 idf discipline), "
    "candidates = docs sharing >= 1 query term",
)
def q_qld_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.retrieval import qld_topk

    return qld_topk(table(spark, sf_dir, "documents"), _RETRIEVAL_QUERIES, k=10)


@_q(
    "sft_loss_masking_plan",
    f"""
    WITH {_CONV_SQL},
    tc AS (
      SELECT doc_id, t,
             list_transform(t, x -> CAST(len(list_filter(
               string_split(coalesce(x.content, ''), ' '), w -> w <> ''))
               AS BIGINT)) AS tcs,
             list_transform(t, x -> CAST(CASE WHEN x.role = 'assistant'
               THEN 1 ELSE 0 END AS BIGINT)) AS mk
      FROM parsed
    )
    SELECT doc_id,
           CASE WHEN t IS NULL THEN NULL
                ELSE CAST(coalesce(list_sum(tcs), 0) AS BIGINT) END
             AS n_total_tokens,
           CASE WHEN t IS NULL THEN NULL
                ELSE CAST(coalesce(list_sum(list_transform(
                       range(1, len(t) + 1), i -> tcs[i] * mk[i])), 0) AS BIGINT)
           END AS n_loss_tokens,
           CASE WHEN t IS NULL THEN NULL
                ELSE CAST(coalesce(list_sum(list_transform(
                       range(1, len(t) + 1),
                       i -> CASE WHEN mk[i] = 1 AND (i = 1 OR mk[i - 1] = 0)
                                 THEN 1 ELSE 0 END)), 0) AS BIGINT)
           END AS n_spans,
           CASE WHEN t IS NULL THEN NULL
                WHEN coalesce(list_position(mk, CAST(1 AS BIGINT)), 0) = 0
                  THEN NULL
                ELSE CAST(coalesce(list_sum(
                       tcs[1:list_position(mk, CAST(1 AS BIGINT)) - 1]), 0)
                     AS BIGINT)
           END AS first_loss_start,
           CASE WHEN t IS NULL THEN NULL
                WHEN coalesce(list_sum(tcs), 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(coalesce(list_sum(list_transform(
                       range(1, len(t) + 1), i -> tcs[i] * mk[i])), 0)
                     * 1000000 // list_sum(tcs) AS BIGINT)
           END AS mask_ratio_micro
    FROM tc
    """,
    "per-conversation SFT loss-mask budget: trainable (assistant) token "
    "count, first trainable span's token offset (the prompt-prefix "
    "cost), contiguous-span count (multi-span convs can't be truncated "
    "at one cut), and the trainable fraction on the exact integer grid "
    "— the packing pre-pass every instruction tuner runs after "
    "sft_turn_stats' structure gate.  Array lambdas over one typed "
    "parse, zero explode; malformed JSON propagates NULL (errors-as-"
    "data)",
)
def q_sft_loss_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wellmeet_data_pipeline_spark.operators.sft import loss_masking_plan

    return loss_masking_plan(_conv_frame(spark, sf_dir), "conv")
