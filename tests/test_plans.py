"""Physical-plan assertions: the optimizations the scale design depends on
must actually appear in the executed plan (a regression here is silent —
results stay correct, cost explodes at 100 TB)."""

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def plan_of(spark, qs, name, sf_dir):
    return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_flagship_uses_topk_and_pushdown(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "flagship", sf_dir)
    assert "TakeOrderedAndProject" in plan  # limit+sort fused, no full sort
    assert "PushedFilters: [IsNotNull(o_totalprice), LessThan(o_totalprice" in plan


def test_scan_projects_only_needed_columns(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "scan_filter_project", sf_dir)
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_extendedprice" not in scan_line  # unprojected column pruned
    assert "l_quantity" in scan_line


def test_small_dims_broadcast(spark, qs, sf_dir):
    assert "BroadcastHashJoin" in plan_of(spark, qs, "join_broadcast", sf_dir)
    q5 = plan_of(spark, qs, "tpch_q5", sf_dir)
    assert "BroadcastHashJoin" in q5
    assert "CartesianProduct" not in q5


def test_theta_join_is_bnlj_not_cartesian(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "join_theta", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_per_group_uses_window_group_limit(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "topk_per_group", sf_dir)
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_partial_aggregation_before_shuffle(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "tpch_q1", sf_dir)
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("Exchange") == 1  # exactly one shuffle for the agg


def test_semi_join_stays_semi(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "join_semi", sf_dir)
    assert "LeftSemi" in plan


def test_no_python_udfs_in_relational_core(spark, qs, sf_dir):
    for name in ["tpch_q1", "join_inner", "window_rank", "string_funcs",
                 "math_funcs", "array_funcs"]:
        plan = plan_of(spark, qs, name, sf_dir)
        assert "BatchEvalPython" not in plan, f"{name} fell off codegen path"
