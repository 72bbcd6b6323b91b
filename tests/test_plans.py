"""Plan-regression tests: assert the physical-plan properties the 100 TB
posture depends on (DESIGN.md).  If a refactor silently turns a broadcast
into a shuffle or un-pushes a filter, these fail before any benchmark
does."""

from pyspark.sql import functions as F

from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "join_star_enrich")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pricing_summary_pushes_filter_and_prunes(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: no unused columns in ReadSchema
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_orderby_limit_is_take_ordered(spark):
    plan = _plan(spark, "orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_anti_join_not_cartesian(spark):
    plan = _plan(spark, "join_anti_new_rows")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_flagship_no_cartesian_and_pruned_seen_scan(spark):
    plan = _plan(spark, "flagship_incremental_enrich")
    assert "CartesianProduct" not in plan
    # the seen-set branch must not read value/event_id (column pruning)
    seen_scans = [s for s in plan.split("ReadSchema: ")[1:] if "event_type" in s[:200]]
    assert any("value" not in s[:120] for s in seen_scans)


def test_scrub_pii_collapses_into_scan(spark):
    # regexp chain is a pure projection: no Exchange anywhere in the plan
    plan = _plan(spark, "scrub_pii")
    assert "Exchange" not in plan


def test_decontaminate_broadcasts_benchmark_side(spark):
    plan = _plan(spark, "decontaminate_benchmark")
    # the tiny benchmark shingle set must reach the semi-join as a broadcast
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_exchange_on_key(spark):
    plan = _plan(spark, "asof_join_last_purchase")
    # union + window layout: exactly one shuffle, keyed on user_id
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_tfidf_broadcasts_scalar_count(spark):
    plan = _plan(spark, "tfidf_top_terms")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exact_similarity_no_collect_in_plan(spark):
    # blocked cogroup: FlatMapCoGroupsInPandas is the only Python stage
    plan = _plan(spark, "cosine_topk_bruteforce")
    assert "FlatMapCoGroupsInPandas" in plan


def test_bucketed_join_and_agg_zero_exchange(spark):
    # bucketed orders⋈lineitem + groupBy on the bucket key: the entire
    # query runs without a single shuffle — write-time bucketing amortized
    plan = _plan(spark, "bucketed_order_revenue")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_line_dedup_single_shuffle_on_line(spark):
    # keep-first needs exactly the window shuffle on the line text plus
    # the reassembly agg on doc_id — no joins, no cartesian
    plan = _plan(spark, "line_dedup_global")
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_pack_sequences_partial_windows_only(spark):
    # per-stream running sums: hash-partitioned window on stream_id,
    # never a single global sort
    plan = _plan(spark, "pack_sequences")
    assert "Exchange hashpartitioning(stream_id" in plan
    assert "Exchange SinglePartition" not in plan


def test_partition_pruned_week_prunes_directories(spark):
    # the date filter must reach PartitionFilters (directory pruning),
    # leaving only the 7 requested day-partitions in the scan
    plan = _plan(spark, "partition_pruned_week")
    assert "PartitionFilters" in plan
    # both range bounds must appear INSIDE the partition predicate, not as
    # a post-scan Filter
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "2024-01-08" in pf and "2024-01-14" in pf


def test_ngram_jaccard_lsh_tier_matches_exact(spark):
    """The MinHash-LSH candidate tier must reproduce the exact inverted-
    index result pair-for-pair on the oracle corpus — the scale path is a
    faster route to the same answer, not a different answer."""
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY

    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in REGISTRY["ngram_jaccard_pairs"].fn(spark, SF).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in REGISTRY["ngram_jaccard_pairs_lsh"].fn(spark, SF).collect()
    }
    assert exact == lsh and len(exact) > 0


def _window_partition_specs(plan):
    """Partition-spec prefix of every windowspecdefinition in the plan."""
    import re

    return re.findall(r"windowspecdefinition\(([^)]*)", plan)


def test_vocab_coverage_no_unpartitioned_window(spark):
    # two-pass range-partitioned prefix sum: every WindowExec must be
    # partitioned by _pid — the old form ranked the whole vocabulary in a
    # single task ("WindowExec: No Partition Defined")
    plan = _plan(spark, "vocab_coverage")
    specs = _window_partition_specs(plan)
    assert specs and all(s.startswith("_pid") for s in specs), specs


def test_user_value_quartiles_no_unpartitioned_window(spark):
    # ntile/percent_rank derived from the two-pass rank: no global window
    # over the user-cardinality frame
    plan = _plan(spark, "user_value_quartiles")
    specs = _window_partition_specs(plan)
    assert specs and all(s.startswith("_pid") for s in specs), specs


def test_returned_item_report_take_ordered_not_window(spark):
    # r5 fix: the top-20 cut is TakeOrderedAndProject (distributed partial
    # top-k), never a row_number window over the customer-cardinality frame
    plan = _plan(spark, "returned_item_report")
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan


def test_classifier_auc_no_unpartitioned_window(spark):
    # the negatives-below prefix sum rides global_rank_cumsum: every
    # WindowExec partitioned by _pid
    plan = _plan(spark, "classifier_auc")
    specs = _window_partition_specs(plan)
    assert all(s.startswith("_pid") for s in specs), specs


def test_interval_overlap_no_cartesian(spark):
    # grid blocking keeps the interval join an equi join + filter
    plan = _plan(spark, "interval_overlap_sessions")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_approx_distinct_sketch_within_rsd_bound(spark):
    # rows-only holdout evidence (r6 verdict #4): the native HLL++ estimate
    # must sit within a generous multiple of its configured rsd (2%) of the
    # exact per-type distinct count.  5x the nominal rsd ~ 10% absorbs the
    # estimator's tail while still catching a broken sketch outright.
    from wellmeet_data_pipeline_spark.plans.queries import REGISTRY, table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["approx_distinct_sketch"].fn(spark, SF).collect()
    }
    ev = table(spark, SF, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= max(0.10 * exact[et], 2), (et, est, exact[et])
