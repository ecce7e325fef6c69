"""Physical-plan quality gates — the scale properties the engine promises
(pushdown, pruning, broadcast, partial aggregation, shuffle-free narrow
ops) asserted on the actual executed plans so they can't silently regress.
"""

from __future__ import annotations

import pytest

from shuttlestandalonedbcreator_spark.queries import CATALOG


def plan_of(spark, sf_small, name: str) -> str:
    return (
        CATALOG[name]
        .spark(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_filter_pushdown_reaches_scan(spark, sf_small):
    plan = plan_of(spark, sf_small, "files_filter")
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_column_pruning(spark, sf_small):
    plan = plan_of(spark, sf_small, "files_filter")
    # 3-column projection must reach the parquet reader, not post-scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in plan


def test_date_range_pushdown(spark, sf_small):
    plan = plan_of(spark, sf_small, "orders_by_month")
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_lookup_join_broadcasts(spark, sf_small):
    plan = plan_of(spark, sf_small, "broadcast_lookup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_k_avoids_global_sort(spark, sf_small):
    plan = plan_of(spark, sf_small, "top_k")
    assert "TakeOrderedAndProject" in plan


def test_aggregation_is_partial_then_final(spark, sf_small):
    plan = plan_of(spark, sf_small, "pricing_summary")
    # map-side partial agg before the shuffle, final after
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_simhash_is_shuffle_free(spark, sf_small):
    plan = plan_of(spark, sf_small, "simhash")
    for marker in ("Exchange hashpartitioning", "Exchange rangepartitioning"):
        # the only exchange allowed is the fan_out round-robin repartition
        assert marker not in plan


def test_hierarchy_uses_native_recursion(spark, sf_small):
    plan = plan_of(spark, sf_small, "hierarchy_closure")
    assert "UnionLoop" in plan


@pytest.mark.parametrize("name", ["status_summary", "grouped_count", "count_distinct"])
def test_aggregations_have_no_cartesian(spark, sf_small, name):
    plan = plan_of(spark, sf_small, name)
    assert "CartesianProduct" not in plan


def test_revenue_join_has_no_distinct_expand(spark, sf_small):
    # n_orders comes from pre-aggregation on the join key, NOT from a
    # COUNT(DISTINCT) Expand + second wide shuffle
    plan = plan_of(spark, sf_small, "join_agg_revenue")
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcasts


def test_gapfill_joins_broadcast(spark, sf_small):
    # both the spine cross join and the fact left join stay broadcast —
    # nothing in this query may shuffle-join
    plan = plan_of(spark, sf_small, "gapfill_hourly")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_incremental_index_join_is_keyed(spark, sf_small):
    # batch-vs-index candidates must meet on (band, bucket) equi keys —
    # never a cartesian / nested-loop pass over the corpus index
    plan = plan_of(spark, sf_small, "incremental_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
