"""Plan pins for the round-5 composite keys: the Q3-shaped
multi-join must broadcast the filtered dimension, keep the grouped
top-10 as TakeOrderedAndProject (never a global sort), and push the
date/segment predicates into the scans; the transition matrix is a
window over one user-keyed shuffle with no join.
"""
from __future__ import annotations

import re

from engine.registry import load_all

from test_plans import final_plan, formatted, n_shuffles

load_all()


def test_mjoin_topk_plan_shape(spark, sf_dir):
    plan = final_plan(spark, "q_mjoin_topk", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mjoin_topk_predicates_reach_scans(spark, sf_dir):
    f = formatted(spark, "q_mjoin_topk", sf_dir)
    # both fact-side date filters and the segment filter appear as
    # parquet pushed filters
    assert len(re.findall(r"PushedFilters: \[[^\]]*(GreaterThan|LessThan|EqualTo)", f)) >= 2, f


def test_event_transitions_one_user_shuffle_no_join(spark, sf_dir):
    plan = final_plan(spark, "q_event_transitions", sf_dir)
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    assert n_shuffles(plan) <= 2, plan


def test_quantile_bins_no_global_sort(spark, sf_dir):
    # equal-frequency binning must not total-sort the table: no
    # range partitioning anywhere; assignment is a broadcast of the
    # 1-row boundary array
    plan = final_plan(spark, "q_quantile_bins", sf_dir)
    assert "rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_time_range_join_is_bucketed_not_nested_loop(spark, sf_dir):
    # large-large range join must run as an equi-join on the
    # (event_type, cell) bucket key — never a nested-loop range scan
    plan = final_plan(spark, "q_join_time_range", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_interval_union_single_user_exchange(spark, sf_dir):
    # both window passes and the island rollup must reuse ONE
    # user-keyed exchange (plus the final user rollup which Catalyst
    # may satisfy from the same partitioning)
    plan = final_plan(spark, "q_interval_union", sf_dir)
    assert "Join" not in plan, plan
    assert n_shuffles(plan) <= 1, plan


def test_table_checksum_one_scan_partial_final(spark, sf_dir):
    plan = final_plan(spark, "q_table_checksum", sf_dir)
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
