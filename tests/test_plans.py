"""Plan-regression tests: assert the physical-plan properties the 100 TB
posture depends on (DESIGN.md).  If a refactor silently turns a broadcast
into a shuffle or un-pushes a filter, these fail before any benchmark
does."""

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
