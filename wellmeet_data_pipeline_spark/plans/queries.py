"""Query registry facade (r11 split): the registry is populated by
importing the family submodules IN ORDER — queries_core (flagship,
TPC-H shapes, joins/aggs/windows, dedup core), queries_curation
(corpus curation, scoring, layout), queries_retrieval (rotation-era
families: URL, sketches, SFT, retrieval), queries_stats (statistical
monitoring, quantized serving, round-10/11 families) — so REGISTRY
insertion order is exactly the old single-file order.  The driver
window rotation below then pins the first 50 entries explicitly.
External surface (driver, bench, tests): REGISTRY, QuerySpec, table.
"""

from __future__ import annotations

from wellmeet_data_pipeline_spark.plans.queries_core import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_curation import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_retrieval import *  # noqa: F401,F403
from wellmeet_data_pipeline_spark.plans.queries_stats import *  # noqa: F401,F403

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
    # -- r11 window: CORRECTNESS_r10 landed 50/50, so driver evidence now
    # covers everything through the round-9 additions.  The 39 round-10
    # additions (stats family, quantization rungs, winnowing / hamming /
    # PRF, dup-graph clustering + assortativity, ...) have never had a
    # driver row — they lead.  Then the 11 oldest-evidence anchors
    # (r6-green, re-proven on fresh data).  Precomputed at NOTES.md §r11
    # rotation list; the anchors displaced by the round-10b wave move to
    # the r12 rotation. --
    "rendezvous_sharding",
    "reshard_movement_stats",
    "ttr_lexical_diversity",
    "split_leakage_audit",
    "span_corruption_plan",
    "quality_pareto_frontier",
    "winnowing_fingerprints",
    "hamming_exact_neardup",
    "bm25_prf_topk",
    "kmeans_silhouette",
    "cluster_label_purity",
    "tail_index_hill",
    "minhash_union_parity",
    "min_k_prob_score",
    "self_bleu_pairs",
    "source_drift_ks",
    "source_mann_whitney",
    "event_welch_ttest",
    "event_conformal_coverage",
    "brand_price_regression",
    "event_cusum_changepoint",
    "classifier_avg_precision",
    "embedding_binary_quant_recall",
    "stupid_backoff_nll",
    "nation_revenue_gini",
    "quality_length_spearman",
    "user_event_entropy",
    "bloom_size_plan",
    "weekday_seasonal_anomalies",
    "length_quantile_normalize",
    "source_keyness_chi2",
    "dsir_ess_by_source",
    "ab_sample_size_plan",
    "survival_km_conversion",
    "dup_graph_clustering",
    "embedding_int8_recall",
    "daily_revenue_acf",
    "zipf_rank_frequency",
    "dup_graph_assortativity",
    # -- oldest-evidence anchors (oldest r6-green) --
    "late_shipment_priority",
    "length_curriculum",
    "market_share_by_year",
    "pack_efficiency_by_seqlen",
    "perplexity_lang_buckets",
    "product_profit_by_nation",
    "promo_revenue_share",
    "returned_item_report",
    "rolling_7day_active_users",
    "semdedup_survivors",
    "seqlen_histogram",
]


def _rotate_registry() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_WINDOW names absent from REGISTRY: {missing}")
    window = set(_DRIVER_WINDOW)
    rows_only_in_window = [n for n in _DRIVER_WINDOW if REGISTRY[n].oracle is None]
    if rows_only_in_window:
        raise RuntimeError(
            f"rows-only queries waste driver-window slots: {rows_only_in_window}"
        )
    ordered = [*_DRIVER_WINDOW, *[n for n in REGISTRY if n not in window]]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)


_rotate_registry()
