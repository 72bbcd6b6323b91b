"""Round-12 operators: time-series trend/randomness tests, Neyman
allocation, Markov transitions, t-closeness EMD, integer PageRank, QLD
retrieval, SFT loss masking — known-answer and invariant tests on micro
frames (the oracle gate covers the driver-parquet parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.operators.dedup import pagerank_integer
from wellmeet_data_pipeline_spark.operators.projections import t_closeness_audit
from wellmeet_data_pipeline_spark.operators.retrieval import qld_topk
from wellmeet_data_pipeline_spark.operators.sft import loss_masking_plan
from wellmeet_data_pipeline_spark.operators.stats import (
    mann_kendall_by_group,
    markov_transition_probs,
    neyman_allocation_plan,
    runs_test_by_group,
    theil_sen_by_group,
)


def _series(spark, vals, g="a"):
    return spark.createDataFrame(
        [(g, i, v) for i, v in enumerate(vals)], "g string, i long, v long"
    )


def test_mann_kendall_strict_trend(spark):
    # strictly increasing, no ties: S = n(n-1)/2, tau_b = 1
    n = 6
    r = mann_kendall_by_group(_series(spark, [1, 3, 7, 9, 12, 20]), "g", "i", "v").collect()[0]
    assert r["n_periods"] == n and r["s_stat"] == n * (n - 1) // 2
    assert r["tau_b_micro"] == 1_000_000
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    z = (n * (n - 1) // 2 - 1) / math.sqrt(var_s)
    assert r["z_micro"] == math.floor(z * 1_000_000 + 0.5)


def test_mann_kendall_all_tied_is_null(spark):
    # all values tied: tau denominator and var(S) are both 0 → the
    # repo's degenerate-input convention (NULL via try_divide), never
    # a divide error
    r = mann_kendall_by_group(_series(spark, [5, 5, 5, 5]), "g", "i", "v").collect()[0]
    assert r["s_stat"] == 0 and r["tau_b_micro"] is None and r["z_micro"] is None


def test_theil_sen_exact_line(spark):
    # v = 5*i exactly: every pairwise slope is 5e6 micro
    r = theil_sen_by_group(_series(spark, [0, 5, 10, 15, 20]), "g", "i", "v").collect()[0]
    assert r["slope_micro"] == 5_000_000 and r["n_pairs"] == 10


def test_theil_sen_outlier_robust(spark):
    # one wild outlier leaves the median slope on the line (OLS would not)
    r = theil_sen_by_group(
        _series(spark, [0, 5, 10, 1000, 20, 25]), "g", "i", "v"
    ).collect()[0]
    assert r["slope_micro"] == 5_000_000


def test_runs_test_known_answer(spark):
    # values [1,10,2,11,3,12]: lower median 3 (dropped), signs -,+,-,+,+
    r = runs_test_by_group(_series(spark, [1, 10, 2, 11, 3, 12]), "g", "i", "v").collect()[0]
    assert (r["n_above"], r["n_below"], r["n_runs"]) == (3, 2, 4)
    mu = 2 * 3 * 2 / 5 + 1
    var = (2 * 3 * 2) * (2 * 3 * 2 - 5) / (25 * 4)
    assert r["z_micro"] == math.floor((4 - mu) / math.sqrt(var) * 1_000_000 + 0.5)


def test_neyman_zero_variance_stratum_gets_nothing(spark):
    df = spark.createDataFrame(
        [("flat", v) for v in [7, 7, 7, 7]] + [("wide", v) for v in [0, 100, 0, 100]],
        "g string, v long",
    )
    rows = {r["g"]: r for r in neyman_allocation_plan(df, "g", F.col("v"), 100).collect()}
    assert rows["flat"]["weight_scaled"] == 0 and rows["flat"]["alloc_n"] == 0
    assert rows["wide"]["alloc_n"] == 100


def test_markov_transitions_counts_and_probs(spark):
    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate("ABAB")] + [(2, i, t) for i, t in enumerate("ABB")],
        "u long, o long, s string",
    )
    got = {
        (r["from_state"], r["to_state"]): (r["n_trans"], r["p_micro"])
        for r in markov_transition_probs(df, "u", F.col("o"), "s").collect()
    }
    # A->B: 3 of 3 A-transitions; B->A: 1, B->B: 1 of 2 B-transitions
    assert got[("A", "B")] == (3, 1_000_000)
    assert got[("B", "A")] == (1, 500_000)
    assert got[("B", "B")] == (1, 500_000)


def test_t_closeness_flags_skewed_group_only(spark):
    # global (incl. the skewed group): 10@0, 20@1 → cumQ_0 = 1/3.  The
    # balanced groups read |1/2 - 1/3| = 1/6; 'skew' (all at 1) reads
    # |0 - 1/3| = 1/3 — only it crosses t=0.2
    rows = (
        [("a", 0)] * 5 + [("a", 1)] * 5
        + [("b", 0)] * 5 + [("b", 1)] * 5
        + [("skew", 1)] * 10
    )
    df = spark.createDataFrame([(g, v) for g, v in rows], "g string, sv long")
    out = {r["g"]: r["emd_micro"] for r in t_closeness_audit(df, ["g"], "sv", 200_000).collect()}
    assert out == {"skew": 333333}


def test_pagerank_integer_star_matches_reference_formula(spark):
    # K1,3 star: exact integer differential against the same recurrence
    # computed in plain python
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {r["node"]: r["pr_micro12"] for r in pagerank_integer(edges, iters=4).collect()}
    G = 1_000_000_000_000
    deg = {1: 3, 2: 1, 3: 1, 4: 1}
    pr = {v: G // 4 for v in deg}
    for _ in range(4):
        base = (15 * G) // (100 * 4)
        nxt = {}
        for v in deg:
            if v == 1:
                mass = sum((85 * pr[u]) // (100 * deg[u]) for u in (2, 3, 4))
            else:
                mass = (85 * pr[1]) // (100 * deg[1])
            nxt[v] = base + mass
        pr = nxt
    assert got == pr
    # centrality sanity: the hub outranks every leaf
    assert got[1] > got[2] == got[3] == got[4]


def test_qld_ranks_heavier_term_match_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "fast fast fast query"),
            (2, "fast query and other words here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    rows = qld_topk(docs, {0: ["fast", "query"]}, k=3).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in rows}
    assert by_rank[1] == 1  # highest tf on both terms
    assert 3 not in {r["doc_id"] for r in rows}  # no term match → no candidate
    assert all(r["query_id"] == 0 for r in rows)


def test_loss_masking_plan_multi_span(spark):
    conv = (
        '[{"role":"user","content":"a b c"},'
        '{"role":"assistant","content":"d d"},'
        '{"role":"user","content":"e"},'
        '{"role":"assistant","content":"f g h"}]'
    )
    df = spark.createDataFrame([(1, conv)], "doc_id long, conv string")
    r = loss_masking_plan(df, "conv").collect()[0]
    assert r["n_total_tokens"] == 9 and r["n_loss_tokens"] == 5
    assert r["n_spans"] == 2 and r["first_loss_start"] == 3
    assert r["mask_ratio_micro"] == 5 * 1_000_000 // 9


def test_loss_masking_plan_edges(spark):
    rows = [
        (1, '[{"role":"assistant","content":"x y"}]'),  # leading assistant
        (2, '[{"role":"user","content":"x"}]'),  # no assistant
        (3, "not json"),  # malformed → NULLs
    ]
    df = spark.createDataFrame(rows, "doc_id long, conv string")
    got = {r["doc_id"]: r for r in loss_masking_plan(df, "conv").collect()}
    assert got[1]["first_loss_start"] == 0 and got[1]["n_spans"] == 1
    assert got[2]["n_loss_tokens"] == 0 and got[2]["first_loss_start"] is None
    assert got[3]["n_total_tokens"] is None and got[3]["mask_ratio_micro"] is None


def test_exact_percentiles_known_answer(spark):
    from wellmeet_data_pipeline_spark.operators.stats import (
        exact_percentiles_by_group,
    )

    df = spark.createDataFrame(
        [("a", v) for v in range(1, 101)], "g string, v long"
    )
    r = exact_percentiles_by_group(df, "g", F.col("v"), pcts=(50, 90, 99)).collect()[0]
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (100, 50, 90, 99)


def test_pca_power_recovers_planted_direction(spark):
    import numpy as np

    # anisotropic cloud: variance concentrated along a planted direction
    rng = np.random.default_rng(42)
    d = 16
    u = np.zeros(d)
    u[2], u[7] = 3.0, 4.0
    u /= np.linalg.norm(u)
    X = rng.normal(size=(400, d)) * 0.05 + np.outer(rng.normal(size=400), u)
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from wellmeet_data_pipeline_spark.operators.similarity import pca_power_integer

    got = {r["dim"]: r["loading_micro"] for r in pca_power_integer(emb, dims=d, iters=6).collect()}
    v = np.array([got[j + 1] for j in range(d)], dtype=float)
    v /= np.linalg.norm(v)
    # numpy reference: top eigenvector of X^T X (on the same snapped grid
    # the operator uses, but the planted direction dominates either way)
    C = (np.floor(X * 1e6 + 0.5).T @ np.floor(X * 1e6 + 0.5))
    w_np, v_np = np.linalg.eigh(C)
    top = v_np[:, -1]
    assert abs(float(v @ top)) > 0.999


def test_pareto_abc_known_classes(spark, tmp_path):
    # crafted part revenues 80/15/5 (e4 grid): exactly one part per class
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "l_partkey": [1, 2, 3],
            "l_extendedprice": [80.0, 15.0, 5.0],
            "l_discount": [0.0, 0.0, 0.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "lineitem.parquet"))
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    got = {
        r["abc_class"]: (r["n_parts"], r["share_micro"])
        for r in REGISTRY["lineitem_pareto_abc"].fn(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (1, 800_000)
    assert got["B"] == (1, 150_000)
    assert got["C"] == (1, 50_000)


def test_term_burstiness_bursty_beats_uniform(spark):
    from wellmeet_data_pipeline_spark.plans.queries_r12 import q_term_burstiness  # noqa: F401
    from wellmeet_data_pipeline_spark.operators.retrieval import _doc_tokens
    from wellmeet_data_pipeline_spark.operators.stats import snap_micro

    # 'flat' appears once per doc (fano ~0); 'burst' appears 1 or 9 times
    docs = spark.createDataFrame(
        [
            (1, "flat burst"),
            (2, "flat " + "burst " * 9),
            (3, "flat burst"),
            (4, "flat " + "burst " * 9),
        ],
        "doc_id long, text string",
    )
    tf = _doc_tokens(docs, "text", "doc_id").groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    m = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("s"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("q"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    out = {
        r["term"]: r["fano"]
        for r in m.select(
            "term",
            snap_micro(
                F.try_divide(
                    dd("df") * dd("q") - dd("s") * dd("s"),
                    (dd("df") - F.lit(1.0)) * dd("s"),
                )
            ).alias("fano"),
        ).collect()
    }
    assert out["flat"] == 0
    # burst: tf in {1,9,1,9}: var = 64/3, mean 5 → fano = 64/15
    assert out["burst"] == math.floor(64 / 15 * 1_000_000 + 0.5)


def test_chi2_independence_extremes(spark):
    from wellmeet_data_pipeline_spark.operators.stats import chi2_independence

    # perfectly independent 2x2 (uniform cells): chi2 = 0
    indep = spark.createDataFrame(
        [("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5,
        "a string, b string",
    )
    r = chi2_independence(indep, "a", "b").collect()[0]
    assert r["chi2_micro"] == 0 and r["cramers_v_micro"] == 0 and r["dof"] == 1
    # perfectly dependent (diagonal): Cramér's V = 1, chi2 = n*min(r-1,c-1)
    dep = spark.createDataFrame(
        [("x", "p")] * 6 + [("y", "q")] * 6, "a string, b string"
    )
    r = chi2_independence(dep, "a", "b").collect()[0]
    assert r["cramers_v_micro"] == 1_000_000
    assert r["chi2_micro"] == 12 * 1_000_000  # chi2 = n for a 2x2 diagonal


def test_minhash_verify_raw_counts_match_ratios(spark):
    """raw_counts=True must carry exactly the integers behind the default
    output's rounded ratios, pair-for-pair, on the driver's parquet."""
    from wellmeet_data_pipeline_spark.operators.dedup import minhash_verify_sha
    from wellmeet_data_pipeline_spark.plans.queries import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    ratios = {
        (r["id_a"], r["id_b"]): (r["est_jaccard"], r["jaccard"])
        for r in minhash_verify_sha(d).collect()
    }
    counts = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_verify_sha(d, raw_counts=True).collect()
    }
    assert set(ratios) == set(counts) and len(ratios) > 0
    for k, (est, jac) in ratios.items():
        c = counts[k]
        assert round(c["agree"] / 16.0, 6) == est
        assert round(c["i"] / (c["na"] + c["nb"] - c["i"]), 6) == jac


def test_portmanteau_alternating_series(spark, tmp_path):
    # strict daily alternation: rho = -1e6 at odd lags, +1e6 at even ones
    # (all pair correlations are exactly +/-1) — Q is then pure integer
    # arithmetic reproducible in-line
    import duckdb

    con = duckdb.connect()
    n = 20
    con.execute(
        f"""COPY (
          SELECT i AS event_id,
                 TIMESTAMP '2024-01-01' + INTERVAL (i) DAY AS ts,
                 1 AS user_id, 'alt' AS event_type,
                 CASE WHEN i % 2 = 0 THEN 1.0 ELSE 3.0 END AS value,
                 NULL::VARCHAR AS props
          FROM range({n}) t(i)
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"""
    )
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    r = REGISTRY["event_acf_portmanteau"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_periods"] == n and r["m_lags"] == 7
    t_sum = sum((1_000_000 * 1_000_000) // (n - k) for k in range(1, 8))
    assert r["q_micro"] == (n * (n + 2) * t_sum) // 1_000_000


def test_quantile_clip_plan_bounds_order(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    rows = {
        r["dim"]: r
        for r in REGISTRY["embedding_quantile_clip_plan"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert len(rows) == 64
    # recompute each dim's raw min/max on the same 1e6 grid; the clip
    # bounds must sit strictly inside them on a continuous synthetic
    # corpus (p1 == min would defeat the plan), and ordered p1<=p50<=p99
    import duckdb

    ext = {
        int(dim): (lo, hi)
        for dim, lo, hi in duckdb.sql(
            """SELECT i AS dim,
                      min(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
                               AS BIGINT)),
                      max(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
                               AS BIGINT))
               FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet'),
                    range(1, 65) t(i)
               WHERE embedding IS NOT NULL GROUP BY 1"""
        ).fetchall()
    }
    for dim, r in rows.items():
        lo, hi = ext[int(dim)]
        assert r["n"] > 0
        assert lo < r["p1"] <= r["p50"] <= r["p99"] < hi


def test_weekly_cohort_ltv_monotone_cumulative(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    out = REGISTRY["weekly_cohort_ltv"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_cohort: dict = {}
    for r in out:
        assert r["cum_per_user_cents"] == r["cum_cents"] // r["n_cohort"]
        by_cohort.setdefault(r["cohort"], []).append(
            (r["week_offset"], r["cum_cents"])
        )
    # the cumulative invariant, checked against independently recomputed
    # per-week partials (duckdb on the same parquet): cum_cents at each
    # offset must equal the running sum of weekly cents — NOT mere
    # monotonicity, which refunds (negative cents) legitimately break
    import duckdb

    partials: dict = {}
    for coh, off, cents in duckdb.sql(
        """WITH ev AS (
             SELECT user_id,
                    (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk,
                    CAST(round(value * 100) AS BIGINT) AS cents
             FROM read_parquet('/root/testdata/sf0.001/events.parquet')
             WHERE user_id IS NOT NULL AND ts IS NOT NULL
               AND value IS NOT NULL
           ),
           coh AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1)
           SELECT c.cohort, e.wk - c.cohort AS week_offset, sum(e.cents)
           FROM ev e JOIN coh c USING (user_id) GROUP BY 1, 2"""
    ).fetchall():
        partials.setdefault(coh, {})[off] = cents
    assert set(by_cohort) == set(partials)
    for coh, pairs in by_cohort.items():
        offs = [o for o, _ in pairs]
        assert len(offs) == len(set(offs)) == len(partials[coh])
        run = 0
        for off, cum in sorted(pairs):
            run += partials[coh][off]
            assert cum == run


def test_hot_key_salt_plan_ceilings(spark):
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    out = REGISTRY["hot_key_salt_plan"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0  # the synthetic corpus has >64-event users
    for r in out:
        assert r["n_rows"] > 64
        assert r["salt_n"] == -(-r["n_rows"] // 64)
        assert r["post_salt_max"] == -(-r["n_rows"] // r["salt_n"])
        assert r["post_salt_max"] <= 64
