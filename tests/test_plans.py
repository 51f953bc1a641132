"""Physical-plan assertions: the optimizations we claim must show up
in .explain() — pushed filters, pruned schemas, broadcast joins, and
no Python stages outside the kernel boundary."""

import pytest

from jsonld_js_spark.queries import (
    q_agg_pricing_summary,
    q_filter_pushdown_part,
    q_join_broadcast_region_sales,
    q_topk_orders,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(q_filter_pushdown_part(spark, SF))
    assert "PushedFilters: [" in plan
    assert "LessThanOrEqual(p_size,40)" in plan or "IsNotNull(p_size)" in plan
    # column pruning: only the 4 needed columns are read
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_retailprice" not in read and "p_brand" not in read


def test_broadcast_join_selected(spark):
    plan = _plan(q_join_broadcast_region_sales(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle


def test_partial_aggregation_present(spark):
    """Catalyst partial+final hash agg (map-side combine)."""
    plan = _plan(q_agg_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_take_ordered(spark):
    plan = _plan(q_topk_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan
