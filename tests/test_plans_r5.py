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
    # equal-frequency binning must not total-sort the table: the
    # returned (assignment) plan is a literal-array narrow map +
    # one |bins|-row aggregate — no join, no range partitioning, no
    # sort of the fact table (the distributed fit range-partitions
    # only the DISTINCT-VALUE frame, in its own eager jobs)
    plan = final_plan(spark, "q_quantile_bins", sf_dir)
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert n_shuffles(plan) == 1, plan


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


def _node_sequence(plan: str) -> list[str]:
    """Operator node names in order, expressions stripped — the plan
    SHAPE, invariant to which aggregate function fits the boundaries."""
    return re.findall(
        r"\b(HashAggregate|ObjectHashAggregate|SortAggregate|"
        r"Exchange hashpartitioning|Exchange SinglePartition|"
        r"BroadcastNestedLoopJoin|BroadcastExchange|Project|Filter|"
        r"ColumnarToRow|Scan parquet)", plan)


def test_quantile_bins_approx_twin_same_bins_same_assignment_plan(
        spark, sf_dir):
    """The at-scale approx_percentile fit must (a) produce identical
    bins on the fixture (accuracy 1e5 >> fixture n, so the sketch is
    exact there) and (b) leave the bin-assignment plan shape
    untouched — only the fit aggregate's expression may differ."""
    from engine.registry import QUERIES

    key = "spark.engine.quantileBins.approx"
    exact_rows = sorted(
        QUERIES["q_quantile_bins"](spark, sf_dir).collect())
    exact_plan = final_plan(spark, "q_quantile_bins", sf_dir)
    spark.conf.set(key, "true")
    try:
        approx_df = QUERIES["q_quantile_bins"](spark, sf_dir)
        approx_rows = sorted(approx_df.collect())
        approx_plan = final_plan(spark, "q_quantile_bins", sf_dir)
    finally:
        spark.conf.unset(key)
    assert approx_rows == exact_rows
    # both fits run eagerly outside the returned plan; the literal-
    # array ASSIGNMENT plan must be identical and percentile-free
    assert "percentile" not in approx_plan, approx_plan
    assert "percentile" not in exact_plan, exact_plan
    assert _node_sequence(approx_plan) == _node_sequence(exact_plan)


def test_quantile_bins_guard_band_fails_loud():
    """A boundary within epsilon of a .5 quantization edge must raise
    loudly, never silently flip a bin hash."""
    import pytest

    from engine.queries.analytics_extra import _guard_quantize

    # clean boundaries pass and quantize to the 1e-4 grid
    assert _guard_quantize([1.0, 2.00004]) == [1.0, 2.0]
    # a boundary interpolating to exactly x.xxxx5 is ambiguous under
    # a half-up grid and must be rejected
    with pytest.raises(ValueError, match="guard band"):
        _guard_quantize([0.00015])


def test_quantile_bins_distributed_fit_matches_builtin(spark, sf_dir):
    """The distributed (counts + range-parallel prefix-rank) exact
    fit must reproduce Spark's built-in exact percentile() to the
    last ulp on the fixture."""
    from pyspark.sql import functions as F

    from engine.io import load_tables
    from engine.queries.analytics_extra import (
        _DECILES, _exact_quantiles_distributed)

    li = load_tables(spark, sf_dir)["lineitem"]
    got = _exact_quantiles_distributed(li, "l_extendedprice", _DECILES)
    ps = ", ".join(str(p) for p in _DECILES)
    want = li.agg(F.expr(
        f"percentile(l_extendedprice, array({ps}))").alias("r")
    ).collect()[0]["r"]
    assert len(got) == len(want) == 9
    for g, w in zip(got, want):
        assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (g, w)


def test_quantile_distributed_fit_property(spark):
    """Random multisets (duplicates, skew, negatives): the
    distributed fit equals the builtin exact percentile for arbitrary
    probability vectors."""
    import random

    from pyspark.sql import functions as F

    from engine.queries.analytics_extra import _exact_quantiles_distributed

    rng = random.Random(7)
    for trial in range(3):
        vals = [round(rng.choice([rng.uniform(-5, 5), float(rng.randint(0, 9))]), 2)
                for _ in range(rng.randint(3, 400))]
        probs = sorted(rng.uniform(0, 1) for _ in range(5))
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = _exact_quantiles_distributed(df, "x", probs)
        ps = ", ".join(repr(p) for p in probs)
        want = df.agg(F.expr(f"percentile(x, array({ps}))").alias("r")
                      ).collect()[0]["r"]
        for g, w in zip(got, want):
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (trial, g, w)


def test_quantile_distributed_fit_nulls_ignored(spark):
    """NULLs must not shift ranks (percentile semantics)."""
    from engine.queries.analytics_extra import _exact_quantiles_distributed

    df = spark.createDataFrame(
        [(None,), (1.0,), (None,), (2.0,), (3.0,)], "x double")
    got = _exact_quantiles_distributed(df, "x", [0.5])
    assert got == [2.0]
