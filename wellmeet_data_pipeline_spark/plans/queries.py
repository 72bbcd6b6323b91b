"""Query registry facade (r11 split): the registry is populated by
importing the family submodules IN ORDER — queries_core (flagship,
TPC-H shapes, joins/aggs/windows, dedup core), queries_curation
(corpus curation, scoring, layout), queries_retrieval (rotation-era
families: URL, sketches, SFT, retrieval), queries_stats (statistical
monitoring, quantized serving, round-10/11 families), queries_r12
(time-series tests, session paths, privacy EMD, integer spectral /
graph iterations, QLD retrieval, loss masking) — so REGISTRY insertion
order is exactly the old single-file order.  The driver window
rotation below then pins the first 50 entries explicitly.
External surface (driver, bench, tests): REGISTRY, QuerySpec, table.
"""

from __future__ import annotations

from wellmeet_data_pipeline_spark.plans.queries_core import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_curation import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_retrieval import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_stats import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_r12 import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_r13 import *  # noqa: F401,F403

from wellmeet_data_pipeline_spark.plans.queries_core import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    _q,
    table,
)
from wellmeet_data_pipeline_spark.plans.queries_retrieval import _synth_url_frame  # noqa: F401
from wellmeet_data_pipeline_spark.plans.queries_retrieval import _synth_conv_spark  # noqa: F401


# ---------------------------------------------------------------------------

_DRIVER_WINDOW: list[str] = [
    # -- r13 window (precomputed at NOTES.md §r12 close, validated by
    # the r12 VERDICT): CORRECTNESS_r12 landed 50/50, so the queries
    # without driver evidence are the 19 round-12 additions — they
    # lead.  Then (r12 verdict item 5) the 4 rows-only queries that
    # have never had ANY driver row — dedup_embedding_lsh,
    # approx_distinct_sketch, bitext_mine_margin_ivf,
    # compression_quality — each backed by a documented pytest
    # differential (COVERAGE.md); a rows>0 driver row closes their
    # loop.  Then the 27 oldest-evidence anchors (remaining r7-green
    # alphabetical, then the oldest r8 block, truncated to fit 50). --
    "daily_revenue_mann_kendall",
    "daily_revenue_runs_test",
    "daily_revenue_theil_sen",
    "dedup_threshold_sweep",
    "dup_graph_pagerank",
    "embedding_pca_power",
    "embedding_quantile_clip_plan",
    "event_acf_portmanteau",
    "event_markov_transitions",
    "hot_key_salt_plan",
    "lineitem_pareto_abc",
    "order_cycle_percentiles",
    "qld_topk",
    "returnflag_status_chi2",
    "sft_loss_masking_plan",
    "stratified_sample_plan",
    "t_closeness_audit",
    "term_burstiness_top_df",
    "weekly_cohort_ltv",
    # -- rows-only, never driver-checked (r12 verdict item 5) --
    "dedup_embedding_lsh",
    "approx_distinct_sketch",
    "bitext_mine_margin_ivf",
    "compression_quality",
    # -- oldest-evidence anchors --
    "readability_scores",
    "scrub_pii",
    "session_window",
    "sliding_window",
    "source_drift_js",
    "source_vocab_overlap",
    "stratified_sample",
    "surrogate_key_sha2",
    "tfidf_top_terms",
    "trimmed_mean_by_type",
    "tumbling_window",
    "union_distinct",
    "url_decode_keys",
    "validate_required_fields",
    "vocab_growth_curve",
    "asof_join_last_purchase",
    "basket_part_pairs",
    "bucketed_order_revenue",
    "chunk_documents",
    "contamination_report",
    "corpus_shuffle_shards",
    "corpus_split",
    "cosine_topk_bruteforce",
    "cosine_topk_exact_clustered",
    "cube_subtotals",
    "customer_above_avg",
    "date_parts",
]

# Rows-only queries are normally kept out of the window (an oracle-less
# slot forfeits the strict hash check), but the r12 verdict item 5
# explicitly spends 4 slots to give the only zero-driver-evidence
# entries a rows>0 row; their strict evidence is the paired pytest
# differential named in COVERAGE.md.
_ROWS_ONLY_WINDOW_ALLOWLIST = {
    "dedup_embedding_lsh",
    "approx_distinct_sketch",
    "bitext_mine_margin_ivf",
    "compression_quality",
}


def _rotate_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names absent from REGISTRY: {missing}")
    window = set(_DRIVER_WINDOW)
    rows_only_in_window = [
        n
        for n in _DRIVER_WINDOW
        if REGISTRY[n].oracle is None and n not in _ROWS_ONLY_WINDOW_ALLOWLIST
    ]
    if rows_only_in_window:
        raise RuntimeError(
            f"rows-only queries waste driver-window slots: {rows_only_in_window}"
        )
    ordered = [*_DRIVER_WINDOW, *[n for n in REGISTRY if n not in window]]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_rotate_registry()
