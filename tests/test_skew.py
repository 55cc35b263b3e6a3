"""Salted join: equality with the plain join, and the salt actually
reaches the join keys / spreads the hot key across reducers."""
from engine.skew import salted_join
from pyspark.sql import functions as F


def _fixture(spark):
    # 90% of big-side rows share key 0 — the pathological hot key
    big = spark.range(20000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100)
         .alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr"))
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _fixture(spark)
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.sum("attr").alias("sa"))
    salted = salted_join(big, small, ["k"], salt_src="id").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.sum("attr").alias("sa"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salt_is_a_join_key(spark):
    big, small = _fixture(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join so the partitioning keys are visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = salted_join(big, small, ["k"], salt_src="id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan
        assert "hashpartitioning(k" in plan and "_salt" in plan.split(
            "hashpartitioning(k", 1)[1][:60]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hot_key_spreads_across_salts(spark):
    big, _ = _fixture(spark)
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("int"))
    dist = (salted.filter(F.col("k") == 0).groupBy("_salt").count()
            .collect())
    assert len(dist) == 8  # every salt bucket gets a share of key 0
    counts = [r["count"] for r in dist]
    assert max(counts) < 2 * min(counts)  # roughly even spread


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    big, small = _fixture(spark)
    for how in ("full", "right", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], salt_src="id", how=how)
