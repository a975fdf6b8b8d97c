"""Physical-plan regression tests over the catalog: the plan shape is
the 100 TB performance model, so the load-bearing properties — filters
reaching the parquet scan, dims broadcasting, top-K lowering to
TakeOrderedAndProject, map-only passes staying shuffle-free — are
asserted here against the real testdata scans (plan shape is
SF-independent; sf0.001 keeps it cheap)."""

from __future__ import annotations

import pytest

from dnsflow_clickhouse_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    count_exchanges,
    physical_plan,
)
from dnsflow_clickhouse_spark.queries import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def _q(name, spark):
    return QUERY_REGISTRY[name][0](spark, SF)


def test_q6_filters_reach_the_scan(spark):
    df = _q("q6_forecast_revenue", spark)
    assert_pushed_filters(df, "l_shipdate")
    # column pruning: the 16-column lineitem scan reads only what q6 uses
    plan = physical_plan(df)
    assert "l_returnflag" not in plan.split("ReadSchema")[1][:400]


def test_q5_star_joins_broadcast(spark):
    df = _q("q5_region_revenue", spark)
    assert_broadcast_join(df)
    assert "SortMergeJoin" not in physical_plan(df).replace(
        "BroadcastHashJoin", ""
    ).split("lineitem")[0]


def test_flow_report_topk_is_take_ordered(spark):
    plan = physical_plan(_q("flow_report_topk", spark))
    assert "TakeOrderedAndProject" in plan


def test_doc_quality_score_is_map_only(spark):
    # one range Exchange for the final orderBy is the ONLY shuffle
    assert count_exchanges(_q("doc_quality_score", spark)) <= 1


def test_stratified_sample_is_pure_filter(spark):
    # hash gate is a filter over the scan: no join, no aggregate shuffle
    assert count_exchanges(_q("stratified_doc_sample", spark)) <= 1


def test_q4_semi_join_never_widens(spark):
    plan = physical_plan(_q("q4_priority_semi", spark))
    assert "LeftSemi" in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = physical_plan(_q("q22_idle_customers", spark))
    assert "LeftAnti" in plan
    assert "Broadcast" in plan
