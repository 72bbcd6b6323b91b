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
    # -- r14 window (optimization round 2).  Priority order: (1) the
    # oracle-backed queries this round's optimizations touch — the
    # hash-pinned exact similarity tiers (kernel rewrite), the
    # retrieval family (toks/stats threading), the shingle-base
    # consumers — so the driver itself verifies the changed paths;
    # (2) the 19 round-13-build additions never driver-sampled
    # (CORRECTNESS_r12 ∪ r13 miss them); (3) oldest-evidence core
    # anchors (r1/r2 queries outside both recent samples).  The 4
    # rows-only entries leave the window: they got their driver rows in
    # r13 and now additionally carry live-fixture differentials
    # (tests/test_rows_only_live_differentials.py). --
    "cosine_topk_bruteforce",
    "cosine_topk_exact_clustered",
    "hard_negatives_topk",
    "bitext_mine_margin",
    "kmeans_cluster_step",
    "semdedup_survivors",
    "ivf_index_merge",
    "matryoshka_prefix_recall",
    "jaccard_prefix_join",
    "dedup_vs_reference",
    "bm25_prf_topk",
    "retrieval_eval_bm25",
    "rag_context_pack",
    "mmr_diversified_topk",
    # -- r13-build additions, never driver-sampled --
    "ewma_control_chart",
    "kendall_tau_daily",
    "event_overdispersion_index",
    "survival_na_hazard",
    "scd2_user_state",
    "dp_contribution_clip",
    "cuped_adjusted_metric",
    "brier_decomposition",
    "woe_information_value",
    "dup_graph_hits",
    "dup_link_prediction",
    "file_compaction_plan",
    "priority_sample_docs",
    "edit_distance_neardup",
    "revenue_attribution_touch",
    "dedup_normalization_ladder",
    "krippendorff_alpha",
    "ratio_metric_delta_ci",
    "srm_check",
    # -- oldest-evidence core anchors --
    "pricing_summary",
    "rollup_subtotals",
    "intersect_keys",
    "except_keys",
    "topk_per_group",
    "date_trunc_month",
    "text_token_stats",
    "text_quality_score",
    "text_language_guess",
    "lang_id_confusion",
    "script_mix_stats",
    "doc_fingerprint",
    "dedup_exact_documents",
    "window_running_sum",
    "pivot_event_counts",
    "grouping_sets",
    "stats_by_type",
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
