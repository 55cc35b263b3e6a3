"""Plan-shape pins for the round-6 final-wave operators: the
scale claims in each docstring (broadcast small sides, PARTITIONed
windows, map-side-combined aggregates, cardinality-sized window
inputs) asserted against the executed AQE plan, so a regression that
silently flips a broadcast to a sort-merge join or widens a window
to the raw data fails here, not at 100 TB.
"""
from __future__ import annotations

import re

from engine.registry import QUERIES, load_all

from test_plans import final_plan, n_shuffles

load_all()


def test_skyline_window_is_partitioned(spark, sf_dir):
    plan = final_plan(spark, "q_skyline", sf_dir)
    m = re.search(r"Window \[.*windowspecdefinition\(([^,]+),", plan)
    assert m and "p_brand" in m.group(1), plan
    assert "CartesianProduct" not in plan, plan


def test_gini_broadcasts_customer_dim(spark, sf_dir):
    plan = final_plan(spark, "q_gini", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # rank window is keyed by nation, never global
    m = re.search(r"windowspecdefinition\(([^,]+),", plan)
    assert m and "c_nationkey" in m.group(1), plan


def test_ab_welch_single_aggregation_pass(spark, sf_dir):
    # six conditional moments in ONE groupBy: exactly one data
    # shuffle (the hour exchange)
    plan = final_plan(spark, "q_ab_welch", sf_dir)
    assert n_shuffles(plan) == 1, plan
    assert "partial_sum" in plan, plan  # map-side combine present


def test_feature_hash_single_combined_aggregate(spark, sf_dir):
    plan = final_plan(spark, "q_feature_hash", sf_dir)
    assert n_shuffles(plan) == 1, plan
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan


def test_chi2_marginal_joins_are_broadcast(spark, sf_dir):
    plan = final_plan(spark, "q_chi2_independence", sf_dir)
    assert "SortMergeJoin" not in plan, plan
    # the r x c grid is built from broadcasts (cross + left)
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan, plan


def test_ks_and_mann_whitney_window_input_is_collapsed(spark, sf_dir):
    """The ordered window must consume the value-grouped frame (an
    aggregate feeds the window), never the raw lineitem rows."""
    for key in ("q_ks_test", "q_mann_whitney"):
        plan = final_plan(spark, key, sf_dir)
        w = plan.index("Window")
        assert "HashAggregate" in plan[w:], (key, plan)
        # the raw scan feeds an aggregate BEFORE any window: the
        # aggregate's partial pass appears below the window node
        assert "partial_sum" in plan[w:], (key, plan)


def test_time_weighted_avg_reuses_series_exchange(spark, sf_dir):
    """Lead window and final aggregate share the user_id key: the
    plan must carry at most the one series shuffle (AQE reuses the
    window's exchange for the same-key groupBy)."""
    plan = final_plan(spark, "q_time_weighted_avg", sf_dir)
    assert n_shuffles(plan) <= 2, plan
    m = re.search(r"windowspecdefinition\(([^,]+),", plan)
    assert m and "user_id" in m.group(1), plan


def test_rfm_boundaries_are_broadcast_not_windowed(spark, sf_dir):
    """Quintile scoring must come from the broadcast 1-row boundary
    frame — no ntile/global rank window over the customer data."""
    plan = final_plan(spark, "q_rfm_segment", sf_dir)
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan, plan


def test_dedup_paragraph_shuffles_hashes_not_text(spark, sf_dir):
    """Every exchange in the chunk-dedup plan carries (chash,
    doc_id)-shaped rows — the document text column must never
    appear in an exchange's output schema."""
    plan = final_plan(spark, "q_dedup_paragraph", sf_dir)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan


def test_containment_prefilter_twin_matches_default(spark, sf_dir):
    """The at-scale prefilter twin (candidate-doc semi-filter on the
    d2 shingle side, spark.engine.containment.prefilter=true) must
    return EXACTLY the default path's rows — same pairs, same exact
    intersection counts, same rounded containment."""
    base = sorted(
        QUERIES["q_dedup_containment"](spark, sf_dir).collect())
    spark.conf.set("spark.engine.containment.prefilter", "true")
    try:
        twin = sorted(
            QUERIES["q_dedup_containment"](spark, sf_dir).collect())
    finally:
        spark.conf.unset("spark.engine.containment.prefilter")
    assert twin == base


def test_basket_rules_no_self_join_and_mapside_basket_dedup(spark, sf_dir):
    """Pair mining must stay the basket-array shape (never a shuffled
    incidence self-join), and the basket build must dedup map-side:
    a partial_collect_set partial aggregate feeds the order exchange,
    so the raw-lineitem branch never pays a separate distinct
    exchange."""
    plan = final_plan(spark, "q_basket_rules", sf_dir)
    assert "SortMergeJoin" not in plan, plan
    assert "partial_collect_set" in plan, plan
