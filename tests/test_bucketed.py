"""The bucketed join must be shuffle-free on both bucketed sides:
no Exchange below the SortMergeJoin in the physical plan."""
from engine.queries.bucketed import prepare_bucketed, q_join_bucketed
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    tag = prepare_bucketed(spark, sf_dir)
    li = spark.table(f"bkt_{tag}_lineitem")
    o = spark.table(f"bkt_{tag}_orders")
    # disable auto-broadcast so the join strategy under test is SMJ
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: no shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_values(spark, sf_dir):
    got = {r.o_orderstatus: (r.n, r.total)
           for r in q_join_bucketed(spark, sf_dir).collect()}
    from engine.io import load_tables
    t = load_tables(spark, sf_dir)
    want = {
        r.o_orderstatus: r.n
        for r in t["lineitem"].join(
            t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
