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


def test_chunking_is_narrow(spark, qs, sf_dir):
    # chunk_documents must stay a pure projection pipeline: any Exchange
    # here turns a linear scan into a shuffle of the whole corpus
    plan = plan_of(spark, qs, "doc_chunks", sf_dir)
    assert "Exchange" not in plan
    assert "Generate explode" in plan  # sequence+explode, not a join


def test_split_prunes_to_id_column(spark, qs, sf_dir):
    # split assignment is a function of the id only; reading text would
    # make a metadata-sized job scan the whole corpus bytes
    plan = plan_of(spark, qs, "train_split", sf_dir)
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_mixture_has_no_shuffle(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "weighted_mixture", sf_dir)
    assert "Exchange" not in plan  # narrow filters + plan-level union


def test_vocab_topk_is_distributed_sort(spark, qs, sf_dir):
    # the top-N cut must be TakeOrderedAndProject (per-partition top-N),
    # not a single-partition global Window over every distinct token
    plan = plan_of(spark, qs, "vocab_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_embedding_transforms_are_narrow(spark, qs, sf_dir):
    for name in ("embed_normalize", "embed_quantize"):
        plan = plan_of(spark, qs, name, sf_dir)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # higher-order fns, not UDFs


def test_pipeline_e2e_exactly_two_shuffles(spark, qs, sf_dir):
    # dedup window (md5 digest) + packing window (bucket): any third
    # Exchange means a stage regressed into an extra pass over the corpus
    plan = plan_of(spark, qs, "pipeline_e2e", sf_dir)
    assert plan.count("+- Exchange") == 2


def test_semi_join_stays_semi(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "join_semi", sf_dir)
    assert "LeftSemi" in plan


def test_q16_counts_distinct_without_expand(spark, qs, sf_dir):
    # distinct-pairs shuffle + plain count: a countDistinct over the fact
    # rows would plan an Expand that duplicates every lineitem row
    plan = plan_of(spark, qs, "tpch_q16", sf_dir)
    assert "Expand" not in plan
    assert "BroadcastHashJoin" in plan  # part + exclusion list broadcast


def test_q2_q20_broadcast_dims_no_cartesian(spark, qs, sf_dir):
    for name in ("tpch_q2", "tpch_q11", "tpch_q20"):
        plan = plan_of(spark, qs, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_decontaminate_probes_with_broadcast_semi(spark, qs, sf_dir):
    # benchmark shingles broadcast into a semi probe: the corpus must not
    # shuffle for candidate matching (only matched ids + the flag join do)
    plan = plan_of(spark, qs, "decontaminate", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_repetition_metrics_is_narrow(spark, qs, sf_dir):
    plan = plan_of(spark, qs, "repetition_metrics", sf_dir)
    assert "Exchange" not in plan  # pure projection pipeline
    assert "BatchEvalPython" not in plan


def test_no_python_udfs_in_relational_core(spark, qs, sf_dir):
    for name in ["tpch_q1", "join_inner", "window_rank", "string_funcs",
                 "math_funcs", "array_funcs"]:
        plan = plan_of(spark, qs, name, sf_dir)
        assert "BatchEvalPython" not in plan, f"{name} fell off codegen path"
