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


def test_snapshot_diff_bucketed_zero_shuffle(spark, sf_dir, tmp_path):
    """The q_snapshot_diff docstring's 100 TB claim, proven: with BOTH
    snapshots stored bucketed by the key, the full-outer CDC diff runs
    as a sort-merge join with NO shuffle exchange on either side."""
    import re

    from pyspark.sql import functions as F

    from engine.queries.bucketed import prepare_bucketed

    tag = prepare_bucketed(spark, sf_dir)
    base = spark.table(f"bkt_{tag}_orders") \
        .select("o_orderkey", F.col("o_totalprice").alias("price"))

    # derive the 'new' snapshot and store it bucketed the same way
    o = spark.table(f"bkt_{tag}_orders") \
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
    upd = (o.filter(F.col("o_orderkey") % 10 == 3)
           .withColumn("price", F.col("price") + 100.0))
    keep = o.filter(~(F.col("o_orderkey") % 10).isin(3, 7))
    ins = (o.filter(F.col("o_orderkey") % 10 == 1)
           .withColumn("o_orderkey", F.col("o_orderkey") + 10000000))
    spark.sql("DROP TABLE IF EXISTS bkt_diff_new")
    (upd.unionAll(keep).unionAll(ins)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "bkt_diff_new"))
        .mode("overwrite").saveAsTable("bkt_diff_new"))
    new = spark.table("bkt_diff_new")

    b, n = base.alias("b"), new.alias("n")
    diff = (
        b.join(n, F.col("b.o_orderkey") == F.col("n.o_orderkey"),
               "full_outer")
        .filter(F.col("b.o_orderkey").isNull()
                | F.col("n.o_orderkey").isNull()
                | (F.col("b.price") != F.col("n.price")))
    )
    rows = diff.count()
    assert rows > 0
    plan = diff._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan, plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan
    spark.sql("DROP TABLE IF EXISTS bkt_diff_new")
