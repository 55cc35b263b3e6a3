"""SparkSession factory and runtime configuration.

The binding configs (empirically required against the driver fixtures,
see SURVEY.md §1.4):

- ``spark.sql.session.timeZone=UTC`` — oracle (DuckDB) timestamps are
  UTC-naive; pinning the session TZ makes epoch arithmetic agree.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — older fixture
  generations store ``events.ts`` as TIMESTAMP(NANOS) which stock
  Spark 4 refuses to read; with the flag it arrives as a bigint of
  nanoseconds which engine.io rebuilds into a microsecond timestamp.
  Current fixtures store native ``timestamp[us]`` (read as
  TIMESTAMP_NTZ, cast to session-tz timestamp); the flag is inert
  for those files, so it stays on for back-compat.
- AQE on — runtime shuffle-partition coalescing and skew-join
  splitting; essential at the 100 TB design point and harmless at
  test scale.

All of these are runtime-settable, so ``configure`` also repairs a
session created by an external harness (the driver builds its own
SparkSession and passes it in).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalescing can only shrink from the INITIAL partition
    # count; with the fixed 32-way layout a decade-scale shuffle
    # (e.g. the 180M-row salted lineitem x orders join at the 100x
    # fixture) sorts ~300 MB per task and spills (probe-caught,
    # round 15: 20.7x time for 10x data; 256 initial partitions
    # measured it back to ~11x). Start high and let AQE coalesce
    # small shuffles down to the 64 MB advisory target — the
    # canonical AQE sizing on a real cluster, where this would be
    # several x the executor-core count.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    # AQE is OFF inside cached plans by default (Spark preserves the
    # cache's output partitioning for potential reuse), so every
    # persist() of a shuffled intermediate materializes at the full
    # initial partition count and each downstream branch pays that
    # many tasks per scan (round-15 profile census: the persist-using
    # keys were the task-heaviest in the suite, e.g.
    # q_contamination_bloom_eval at ~6.9k tasks). Letting AQE
    # re-plan cached shuffles coalesces them to the same 64 MB
    # advisory target as everything else — scale-adaptive in both
    # directions (a 100 TB cached frame keeps thousands of
    # partitions; a kB-sized eval intermediate keeps one).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine configs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; builder-time config required
    return spark


# Python-worker allocator environment (round 16, guide §4.5/§5 —
# Python worker memory behavior). The Arrow block path moves ~20 MB
# binary slabs per row through mapInPandas/applyInPandas workers, and
# on hosts with transparent hugepages in madvise mode numpy's
# MADV_HUGEPAGE on every large fresh buffer forces a synchronous
# 2 MB-page compaction at fault time: a pure-Python repro (no Spark)
# of 32 processes cycling 20 MB arrays measured iterations of median
# 0.067 s stalling to 12.9 s — the exact bimodal "GC band" the
# 128-cube bench entries have shown since round 8, and the whole of
# the r15 driver regression (block path 2.29 -> 10.32 s at 32 cores;
# kcompactd was the only busy kernel thread). glibc compounds it by
# returning >=128 KB mmap'd buffers to the OS on free, so every
# allocation re-faults. Disabling the hugepage madvise and keeping
# large buffers on the heap removed the stalls entirely (max 0.118 s
# across 32 procs). Applied via spark.executorEnv.* — verified to
# reach the pyspark daemon (and every forked worker) in local mode
# too — NOT via the JVM's own process environment: the MALLOC_ knobs
# would also rebind the driver JVM's glibc (netty/Arrow native
# buffers onto lock-contended arenas instead of mmap), an untested
# behavior change for a process that was never the stall source.
# NUMPY_MADVISE_HUGEPAGE is additionally exported to this (driver
# python) process, which the JVM ignores. Scale-safe: allocator
# behavior only, never what any query computes.
PY_WORKER_ENV = {
    "NUMPY_MADVISE_HUGEPAGE": "0",
    "MALLOC_MMAP_THRESHOLD_": "268435456",
    "MALLOC_TRIM_THRESHOLD_": "268435456",
}


def get_spark(app: str = "engine") -> SparkSession:
    """Build (or fetch) the engine's local session.

    local[N] is a single-JVM stand-in for a multi-executor cluster;
    shuffle partitions are sized to the core count, not the 200
    default (right for local; on a real cluster AQE coalescing takes
    over).
    """
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in PY_WORKER_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
