"""Round-15 behavior pins for the two perf/laziness fixes this round
made to session-level memoization:

1. q_tokenizer_apply's per-doc counts frame is memoized per
   (session, sf) — the BPE loading chain (budget -> mix -> pack ->
   ablation) composes it up to three times per downstream action, and
   the round-14 BENCH outliers were exactly this lineage recomputing
   per call. The pin asserts call identity (same DataFrame object),
   which only the memo can produce.
2. q_stream_session_capped's time-sliced stager is passed to
   _run_stream as a THUNK evaluated after the memo check — a memoized
   re-read must never pay the pyarrow sort + 12-slice write again
   (round-14 ADVICE). The pin primes the memo, then re-invokes the
   key with the stager monkeypatched to raise.
"""
from engine.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def test_tokenizer_apply_memoized_per_session(spark):
    a = QUERIES["q_tokenizer_apply"](spark, SF)
    b = QUERIES["q_tokenizer_apply"](spark, SF)
    assert a is b, "q_tokenizer_apply must return its session memo"
    # the memoized frame is persisted (a fit-shaped side-input): the
    # chain that composes it three times must read storage, not
    # recompute the corpus pass
    assert a.storageLevel.useMemory or a.storageLevel.useDisk


def test_stream_session_capped_staging_is_lazy(spark, monkeypatch):
    from engine.queries import streaming_q

    # prime the session memo (runs the stream + stager once)
    first = QUERIES["q_stream_session_capped"](spark, SF).count()
    assert first > 0

    def boom(sf, n_slices=12):
        raise AssertionError(
            "stager ran on a memoized re-read — the src thunk must "
            "only be evaluated when the stream actually executes")

    monkeypatch.setattr(
        streaming_q, "_stage_source_time_sliced", boom)
    again = QUERIES["q_stream_session_capped"](spark, SF).count()
    assert again == first


def test_plan_persist_at_scale_gates_on_source_partitions(spark):
    """Round-15 batch 3: plan_persist_at_scale persists a shared
    subtree ONLY when its source carries at least the session's core
    count of partitions — at fixture scale the recompute is one
    in-memory aggregate and the persist round-trip was A/B-measured
    as a net loss (OPTIMIZATION_r15.md). The gate is structural
    (plan-build time), exactly like engine.io.spread's."""
    import pytest as _pytest
    from pyspark import StorageLevel

    from engine.io import plan_persist_at_scale, session_cache

    p = spark.sparkContext.defaultParallelism
    if p < 2:
        # r15 ADVICE: on local[1] a coalesce(1) source has exactly
        # defaultParallelism partitions, so the fixture-scale arm
        # cannot be constructed (1 is not < 1) and the gate always
        # persists — the test's premise needs at least 2 cores.
        _pytest.skip("plan_persist_at_scale gate needs defaultParallelism >= 2")
    small_src = spark.range(100).coalesce(1)
    big_src = spark.range(1000).repartition(p)
    df = spark.range(10)

    # fixture-scale source: returned UNCHANGED, nothing persisted
    out = plan_persist_at_scale(spark, "t15:gate", df, small_src)
    assert out is df
    assert out.storageLevel == StorageLevel.NONE

    # at-scale source: persisted, and a second call unpersists the
    # previous generation (the plan_persist GC contract)
    out1 = plan_persist_at_scale(spark, "t15:gate", df, big_src)
    assert out1.storageLevel != StorageLevel.NONE
    out2 = plan_persist_at_scale(spark, "t15:gate",
                                 spark.range(11), big_src)
    assert out2.storageLevel != StorageLevel.NONE
    assert out1.storageLevel == StorageLevel.NONE  # GC'd generation
    gc = session_cache(spark, "_engine_plan_persist_gc")
    gc.pop("t15:gate").unpersist()  # leave the session clean
