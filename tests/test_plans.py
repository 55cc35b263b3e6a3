"""Physical-plan shape regression tests.

Correctness tests prove the VALUES; these pin the PLANS — the
properties that decide whether a query survives a 100× scale-up:
filters/projections pushed into the parquet scan, small sides
broadcast, partial aggregation before the shuffle, whole-stage
codegen in the hot paths, and no accidental extra Exchanges. A green
value with a regressed plan is exactly the failure mode these catch.
"""
from __future__ import annotations

import re

from engine.registry import QUERIES, load_all

load_all()


def final_plan(spark, key, sf_dir) -> str:
    """Execute the query so AQE finalizes, then return the plan text.

    collect() (not count()) — count() wraps the plan in a NEW query
    execution, leaving this DataFrame's own adaptive plan unfinalized.
    """
    df = QUERIES[key](spark, sf_dir)
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-runtime plan after the final one;
    # assertions must see only what actually executed
    return s.split("== Initial Plan ==")[0]


def formatted(spark, key, sf_dir) -> str:
    import contextlib
    import io

    df = QUERIES[key](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_shuffles(plan: str) -> int:
    # count shuffle exchanges, excluding reuse references and
    # broadcast exchanges (which move index-sized data, not the table)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def test_scan_projection_prunes_columns(spark, sf_dir):
    f = formatted(spark, "q_scan_project", sf_dir)
    m = re.search(r"ReadSchema: (struct<[^\n]*)", f)
    assert m, f
    read = m.group(1)
    # lineitem has 16 columns; the query projects a handful — the scan
    # must not read the rest
    assert read.count(":") <= 6, read
    assert "l_comment" not in read


def test_scan_filter_pushdown(spark, sf_dir):
    f = formatted(spark, "q_filter_pred", sf_dir)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", f)
    assert m, f
    assert m.group(1).strip(), "no filters reached the parquet scan"


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = final_plan(spark, "q_join_broadcast", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dim_chain_join_broadcasts_dims(spark, sf_dir):
    # orders ⋈ customer ⋈ nation ⋈ region: the nation/region dims must
    # come in as broadcasts, never shuffled fact-style
    plan = final_plan(spark, "q_join_inner", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_flagship_agg_is_partial_final(spark, sf_dir):
    plan = final_plan(spark, "q_agg_pricing_summary", sf_dir)
    # map-side partial + final after one shuffle
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert n_shuffles(plan) == 1, plan
    assert "*(1)" in plan  # whole-stage codegen span markers


def test_minhash_reuses_selfjoin_exchange(spark, sf_dir):
    # the band self-join must reuse the shingle→signature→band subplan
    # via exchange reuse, not compute it twice: 2 shuffles total
    # (signature groupBy + band-key shuffle), the second side reused
    plan = final_plan(spark, "q_dedup_fuzzy_minhash", sf_dir)
    assert n_shuffles(plan) <= 3, plan
    assert "ReusedExchange" in plan or "ReusedSubquery" in plan or \
        n_shuffles(plan) <= 2, plan


def test_tfidf_vocab_is_broadcast(spark, sf_dir):
    plan = final_plan(spark, "q_tfidf_top", sf_dir)
    assert "BroadcastHashJoin" in plan, plan


def test_stitch_voxel_path_single_shuffle(spark, sf_dir):
    # R3 = weight (narrow) ∘ halo-merge (one hash aggregate): the
    # whole stitch must cost exactly one shuffle
    plan = final_plan(spark, "q_stitch_3d", sf_dir)
    assert n_shuffles(plan) == 1, plan


def test_no_cartesian_in_checked_joins(spark, sf_dir):
    # cross joins are reserved for the explicit q_join_cross key and
    # broadcast-literal composition; the equi-join keys must never
    # degrade to a cartesian product
    for key in ("q_join_inner", "q_join_left", "q_join_semi",
                "q_join_anti", "q_tfidf_top"):
        plan = final_plan(spark, key, sf_dir)
        assert "CartesianProduct" not in plan, key


def test_upsert_merge_broadcasts_change_set(spark, sf_dir):
    # the MERGE decomposition must keep the base un-shuffled: the
    # matched branch joins against a BROADCAST change set, and no
    # full-outer sort-merge join (which cannot broadcast and would
    # shuffle the 100 TB base) may appear
    plan = final_plan(spark, "q_upsert_merge", sf_dir)
    assert "BroadcastHashJoin" in plan, plan
    assert "FullOuter" not in plan, plan


def test_embed_quantize_is_narrow(spark, sf_dir):
    # the int8 re-encode is a pure map over the vector table: no
    # Exchange (a 100 TB re-encode job must not shuffle) and no Python
    # in the plan (built-in higher-order functions only)
    plan = final_plan(spark, "q_embed_quantize", sf_dir)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "ArrowEvalPython" not in plan, plan


def test_text_quality_stopwords_not_single_reducer(spark, sf_dir):
    # the global top-20 stopword pick must plan as TakeOrderedAndProject
    # (per-partition heaps + driver merge), never an unpartitioned Window
    # that funnels the whole distinct-word frame through one task
    plan = final_plan(spark, "q_text_quality", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan
    assert not re.search(r"Window ", plan), plan
