"""Runtime-adaptivity proofs: the two Catalyst mechanisms the engine's
100 TB story leans on actually fire at test scale when their
thresholds are met — AQE skew-join splitting and dynamic partition
pruning. These are the claims SCALE.md makes for skewed keys and
partition-eliminating joins.
"""
from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join(spark):
    """One hot key dominating the left side: AQE must mark the
    sort-merge join skew-handled (skew=true) instead of leaving one
    straggler task with the whole hot partition.

    Two fixture subtleties this test encodes (both found empirically):
    the pad column must SURVIVE column pruning into the join output,
    and it must be incompressible (sha2, not a repeated literal) —
    skew detection runs on COMPRESSED shuffle bytes, and 500k
    identical values compress below any threshold."""
    left = spark.range(0, 600_000).select(
        F.when(F.col("id") < 500_000, F.lit(0))
         .otherwise((F.col("id") % 97) + 1).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    right = spark.range(0, 98).select(
        F.col("id").alias("k"), F.col("id").alias("w"))
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="1MB",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="1MB",
    ):
        j = left.join(right, "k").select("k", "w", "pad")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
    assert "skew=true" in plan, plan


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Fact table partitioned by event_type + selective dim filter:
    the fact scan must carry a dynamicpruning partition filter, so
    non-matching partitions are never read."""
    fact_dir = str(tmp_path / "fact")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "value", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # the dim predicate must sit on an INDEPENDENT column: a filter on
    # the join key itself gets statically inferred through the join
    # (plain partition pruning) and DPP never needs to fire
    dim = spark.createDataFrame(
        [("purchase", "x"), ("view", "y"), ("click", "y"),
         ("signup", "y"), ("error", "y")],
        "event_type string, grp string").filter("grp = 'x'")
    with _confs(
        spark,
        spark__sql__optimizer__dynamicPartitionPruning__enabled="true",
    ):
        j = fact.join(dim, "event_type").groupBy("event_type").count()
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
    assert len(rows) == 1 and rows[0]["event_type"] == "purchase"
    assert "dynamicpruning" in plan.lower(), plan
