"""Plan-shape pins for the profiling / DQ / vector operators:
profiling and regression are single-scan join-free aggregates, the
audit's referential check is a broadcast anti join, and the feature
scaler applies fitted statistics as a zero-shuffle narrow map.
"""
from __future__ import annotations

from engine.registry import load_all

from test_plans import final_plan, n_shuffles

load_all()


def test_profile_columns_single_scan_no_join(spark, sf_dir):
    # one scan of lineitem feeds every metric; the exact
    # count(distinct)s expand the aggregate but never join
    plan = final_plan(spark, "q_profile_columns", sf_dir)
    assert "Join" not in plan, plan
    assert "Expand" in plan, plan  # the multi-distinct expansion


def test_profile_columns_approx_twin_no_expand(spark, sf_dir):
    """The at-scale twin replaces the n-fold Expand with per-column
    HLL sketches: same single scan, no join, NO Expand node — and its
    distinct counts land within the rsd=0.01 HLL bound of the exact
    profile while every other metric is bit-identical."""
    from engine.registry import QUERIES

    exact = {r["col_name"]: r for r in
             QUERIES["q_profile_columns"](spark, sf_dir).collect()}
    spark.conf.set("spark.engine.profile.approx", "true")
    try:
        plan = final_plan(spark, "q_profile_columns", sf_dir)
        assert "Join" not in plan, plan
        assert "Expand" not in plan, plan  # the point of the twin
        rows = QUERIES["q_profile_columns"](spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.engine.profile.approx", "false")
    assert set(r["col_name"] for r in rows) == set(exact)
    for r in rows:
        e = exact[r["col_name"]]
        assert r["n_null"] == e["n_null"]
        assert r["min_val"] == e["min_val"]
        assert r["max_val"] == e["max_val"]
        # HLL++ rsd=0.01: allow 5 sigma plus slack for tiny counts
        tol = max(3, 0.05 * e["n_distinct"])
        assert abs(r["n_distinct"] - e["n_distinct"]) <= tol, (
            r["col_name"], r["n_distinct"], e["n_distinct"])


def test_dq_audit_orphan_check_is_broadcast_anti(spark, sf_dir):
    plan = final_plan(spark, "q_dq_audit", sf_dir)
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_linreg_single_pass_partial_final(spark, sf_dir):
    # sufficient statistics: one map-side-combinable shuffle, no join
    plan = final_plan(spark, "q_linreg_group", sf_dir)
    assert n_shuffles(plan) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "Join" not in plan, plan


def test_feature_scale_apply_is_zero_shuffle(spark, sf_dir):
    # the returned transform plan (fit stats already folded in as
    # literals): scan -> project -> posexplode, nothing else
    plan = final_plan(spark, "q_feature_scale", sf_dir)
    assert n_shuffles(plan) == 0, plan
    assert "Join" not in plan, plan
    assert "Generate" in plan, plan  # the posexplode


def test_embed_meanpool_two_aggs_no_join(spark, sf_dir):
    # groupBy(label, dim) then groupBy(label): exactly two exchanges
    plan = final_plan(spark, "q_embed_meanpool", sf_dir)
    assert n_shuffles(plan) == 2, plan
    assert "Join" not in plan, plan
