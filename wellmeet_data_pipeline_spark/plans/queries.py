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
    # -- r12 window (precomputed at NOTES.md §r11 close, validated by the
    # r11 VERDICT): CORRECTNESS_r11 landed 50/50, so the only queries
    # without driver evidence are the 9 round-11 additions — they lead.
    # Then the 41 oldest-evidence anchors (remaining r6/r7-green,
    # alphabetical within age bucket).  After this window lands, every
    # oracle-backed query has driver evidence and rotation is pure
    # refresh. --
    "event_anova_f",
    "event_levene_bf",
    "event_kruskal_wallis",
    "event_winsorized_mean",
    "user_retention_cohorts",
    "event_funnel_conversion",
    "customer_rfm_segments",
    "source_repeated_ngram_rate",
    "dedup_char_savings",
    # -- oldest-evidence anchors (r6/r7-green) --
    "small_quantity_revenue",
    "sql_api_pricing",
    "tokenizer_fertility",
    "top_supplier_revenue",
    "waiting_supplier_orders",
    "zorder_layout_stats",
    "bm25_topk",
    "bootstrap_mean_ci",
    "clean_address_regex",
    "conditional_counts",
    "containment_components",
    "corpus_end_to_end",
    "corpus_quality_filter",
    "decayed_user_value",
    "decontaminate_benchmark",
    "dedup_audit_summary",
    "dedup_embedding_lsh_sha",
    "dedup_keep_first",
    "dedup_simhash_sha",
    "distinct_keys",
    "dup_triangle_count",
    "explode_flatten",
    "extract_place_id_regex",
    "fillna_defaults",
    "flagship_incremental_enrich",
    "format_keys",
    "fuzzy_link_records",
    "geo_grid_neighbors",
    "gopher_quality_rules",
    "gopher_repetition",
    "grouped_sample",
    "hybrid_rrf_topk",
    "join_anti_new_rows",
    "join_insert_if_absent",
    "join_semi_existing",
    "join_star_enrich",
    "l_diversity_audit",
    "ngram_containment_pairs",
    "orderby_limit",
    "pack_sequences",
    "project_rename_cast",
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
