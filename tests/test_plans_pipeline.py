"""Plan-shape pins for the round-3 operators (pipeline composites,
source connectors, analytics extras) — the scale properties: stats
frames broadcast, hash filters stay narrow (zero shuffles), aggregates
partial+final, no accidental cartesian products.
"""
from __future__ import annotations

import re

from engine.registry import QUERIES, load_all

from test_plans import final_plan, n_shuffles

load_all()


def test_dataset_mix_broadcasts_thresholds(spark, sf_dir):
    plan = final_plan(spark, "q_dataset_mix", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stratified_sample_is_narrow(spark, sf_dir):
    # literal CASE rate + hash filter: a pure scan-side predicate
    plan = final_plan(spark, "q_sample_stratified", sf_dir)
    assert n_shuffles(plan) == 0, plan
    assert "Join" not in plan, plan


def test_text_clean_is_narrow(spark, sf_dir):
    plan = final_plan(spark, "q_text_clean", sf_dir)
    assert n_shuffles(plan) == 0, plan


def test_keep_best_single_shuffle(spark, sf_dir):
    plan = final_plan(spark, "q_dedup_keep_best", sf_dir)
    assert n_shuffles(plan) == 1, plan


def test_funnel_has_no_self_joins(spark, sf_dir):
    # conditional-min aggregation, not a 3-way self-join
    plan = final_plan(spark, "q_events_funnel", sf_dir)
    assert "Join" not in plan, plan
    assert n_shuffles(plan) <= 2, plan


def test_token_histogram_partial_final(spark, sf_dir):
    plan = final_plan(spark, "q_token_histogram", sf_dir)
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert n_shuffles(plan) == 1, plan


def test_ngram_freq_two_shuffles(spark, sf_dir):
    # explode → (lang,bigram) agg shuffle → per-lang window shuffle
    plan = final_plan(spark, "q_ngram_freq", sf_dir)
    assert n_shuffles(plan) <= 3, plan
    assert "CartesianProduct" not in plan


def test_retention_no_cartesian(spark, sf_dir):
    plan = final_plan(spark, "q_retention", sf_dir)
    assert "CartesianProduct" not in plan, plan


def test_source_csv_partial_final(spark, sf_dir):
    plan = final_plan(spark, "q_source_csv", sf_dir)
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert n_shuffles(plan) == 1, plan


def test_window_ntile_single_shuffle(spark, sf_dir):
    plan = final_plan(spark, "q_window_ntile", sf_dir)
    assert n_shuffles(plan) == 1, plan


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    # the lang='en' predicate must prune at the DIRECTORY level
    # (PartitionFilters), not just the row-group level
    from test_plans import formatted

    f = formatted(spark, "q_sink_partitioned", sf_dir)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", f)
    assert m and "lang" in m.group(1), f


def test_salted_join_no_broadcast_of_big_sides(spark, sf_dir):
    # the whole point of salting: both sides shuffle on (key, salt);
    # the replicated small side must not silently broadcast (which
    # would make the salt pointless)
    plan = final_plan(spark, "q_join_salted", sf_dir)
    assert "CartesianProduct" not in plan, plan


def test_basket_rules_no_cartesian_broadcast_stats(spark, sf_dir):
    """Apriori shape: the pair join is a co-partitioned equi-join on
    the order key (never cartesian) and the frequent-item stats
    joins are broadcasts."""
    plan = final_plan(spark, "q_basket_rules", sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
