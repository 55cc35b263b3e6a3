"""Plan-shape pins for the round-4 curation/warehouse operators:
the runtime bloom filter actually injects, narrow maps stay
shuffle-free, the contamination holdout broadcasts, and the iterative
PageRank never degenerates into a cartesian product.
"""
from __future__ import annotations

from engine.registry import QUERIES, load_all

from test_plans import final_plan, n_shuffles

load_all()


def test_bloom_join_injects_runtime_filter(spark, sf_dir):
    # the whole point of q_join_bloom: Catalyst's InjectRuntimeFilter
    # pushes a bloom might_contain onto the lineitem scan side, so the
    # big table is pruned BEFORE its shuffle.
    plan = final_plan(spark, "q_join_bloom", sf_dir)
    assert "might_contain" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_snapshot_diff_single_join(spark, sf_dir):
    plan = final_plan(spark, "q_snapshot_diff", sf_dir)
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
        + plan.count("BroadcastHashJoin") == 1, plan


def test_text_chunk_is_narrow(spark, sf_dir):
    # sequence+explode+substring: zero shuffles, chunking runs at
    # scan speed
    plan = final_plan(spark, "q_text_chunk", sf_dir)
    assert n_shuffles(plan) == 0, plan
    assert "Join" not in plan, plan


def test_text_redact_is_narrow(spark, sf_dir):
    plan = final_plan(spark, "q_text_redact", sf_dir)
    assert n_shuffles(plan) == 0, plan
    assert "Join" not in plan, plan
    # regex work stays JVM-side: no Python evaluation in the plan
    assert "Python" not in plan, plan


def test_contamination_broadcasts_holdout(spark, sf_dir):
    # the eval-set gram frame is benchmark-sized → broadcast; corpus
    # grams must never shuffle for the membership probe
    plan = final_plan(spark, "q_contamination", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pagerank_no_cartesian(spark, sf_dir):
    plan = final_plan(spark, "q_pagerank", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_repetition_partial_final_agg(spark, sf_dir):
    # both aggregations map-side combine before their single shuffle
    plan = final_plan(spark, "q_text_repetition", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert n_shuffles(plan) <= 2, plan


def test_bloom_confs_do_not_leak(spark, sf_dir):
    # q_join_bloom runs in a config-isolated sibling session; the
    # caller's session must keep its broadcast threshold
    QUERIES["q_join_bloom"](spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_grouped_topk_agg_has_no_window(spark, sf_dir):
    # the whole point: bounded-buffer aggregation, not a rank window
    plan = final_plan(spark, "q_grouped_topk_agg", sf_dir)
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 2, plan


def test_histogram_partial_final(spark, sf_dir):
    plan = final_plan(spark, "q_histogram", sf_dir)
    assert plan.count("HashAggregate") >= 2, plan
    assert n_shuffles(plan) == 1, plan


def test_vocab_coverage_apply_is_zero_shuffle(spark, sf_dir):
    # fit folded in as a literal array: the returned transform plan is
    # scan -> codegen project/filter, no exchange, no join, no Python
    plan = final_plan(spark, "q_vocab_coverage", sf_dir)
    assert n_shuffles(plan) == 0, plan
    assert "Join" not in plan, plan
    assert "InMemoryTableScan" in plan or "Scan parquet" in plan, plan
