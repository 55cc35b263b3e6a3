"""Plan-shape pins for the geo/spatial operators: the big point side
is never shuffled (cell ring and site dimension broadcast), the kNN
window partitions by point key, and the cell rollup is one map-side-
combinable shuffle.
"""
from __future__ import annotations

from engine.registry import load_all

from test_plans import final_plan, n_shuffles

load_all()


def test_geo_cell_join_broadcasts_ring(spark, sf_dir):
    # the 9-cell site ring is dimension-sized -> broadcast; the point
    # side must reach the join without any exchange
    plan = final_plan(spark, "q_geo_cell_join", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert n_shuffles(plan) == 0, plan
    assert "CartesianProduct" not in plan, plan


def test_geo_knn_is_arrow_map_over_points(spark, sf_dir):
    # exact kNN against a collected site dimension: an Arrow batch
    # map over the point side — no join, no window, no per-pair rows;
    # the only exchange is the round-robin spread of the point rows
    plan = final_plan(spark, "q_geo_knn", sf_dir)
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert n_shuffles(plan) <= 1, plan


def test_geo_cell_stats_partial_final_agg(spark, sf_dir):
    # one shuffle on the cell id with a map-side partial aggregate
    plan = final_plan(spark, "q_geo_cell_stats", sf_dir)
    assert n_shuffles(plan) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "Join" not in plan, plan
