"""Window functions (SURVEY.md §2.2 rows 24-29).

Every ordering is made total with a unique trailing key so results
are deterministic under any partitioning; rank/dense_rank get a
separate coarser ordering (bucketed price) so ties are actually
exercised. All windows partition by a real key — nothing runs a
global single-partition window, which would serialize at scale.
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd, sql_rnd


@query("q_window_rank", oracle="""
WITH t AS (
    SELECT o_custkey, o_orderkey,
           CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket
    FROM orders)
SELECT o_custkey, o_orderkey, price_bucket,
       row_number() OVER w_full  AS rn,
       rank()       OVER w_ties  AS rnk,
       dense_rank() OVER w_ties  AS drnk
FROM t
WINDOW w_full AS (PARTITION BY o_custkey
                  ORDER BY price_bucket DESC, o_orderkey),
       w_ties AS (PARTITION BY o_custkey ORDER BY price_bucket DESC)
QUALIFY rn <= 3
""")
def q_window_rank(spark, sf):
    o = load_tables(spark, sf)["orders"]
    t = o.select(
        "o_custkey", "o_orderkey",
        F.floor(F.col("o_totalprice") / 50000).alias("price_bucket"),
    )
    w_full = W.partitionBy("o_custkey").orderBy(
        F.col("price_bucket").desc(), "o_orderkey")
    w_ties = W.partitionBy("o_custkey").orderBy(F.col("price_bucket").desc())
    return (
        t.withColumn("rn", F.row_number().over(w_full))
        .withColumn("rnk", F.rank().over(w_ties))
        .withColumn("drnk", F.dense_rank().over(w_ties))
        .filter(F.col("rn") <= 3)
    )


@query("q_window_lag_lead", oracle=f"""
WITH e AS (SELECT event_id, user_id, value,
                  epoch_ns(ts) // 1000 AS ts_us
           FROM events)
SELECT event_id, user_id,
       {sql_rnd('lag(value) OVER w')} AS prev_value,
       lead(ts_us) OVER w - ts_us AS gap_us
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
""")
def q_window_lag_lead(spark, sf):
    ev = load_tables(spark, sf)["events"]
    e = ev.select("event_id", "user_id", "value",
                  F.unix_micros("ts").alias("ts_us"))
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    return e.select(
        "event_id", "user_id",
        rnd(F.lag("value").over(w)).alias("prev_value"),
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("gap_us"),
    )


@query("q_window_frame_rows", oracle=f"""
SELECT l_orderkey, l_linenumber, l_partkey,
       {sql_rnd('''sum(l_quantity) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)''')} AS mov_qty
FROM lineitem
""")
def q_window_frame_rows(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    w = (
        W.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, 0)
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_partkey",
        rnd(F.sum("l_quantity").over(w)).alias("mov_qty"),
    )


@query("q_window_frame_range", oracle=f"""
SELECT o_orderkey, o_orderstatus,
       {sql_rnd('''sum(o_totalprice) OVER (
           PARTITION BY o_orderstatus
           ORDER BY o_orderkey
           RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)''')} AS range_sum
FROM orders
""")
def q_window_frame_range(spark, sf):
    o = load_tables(spark, sf)["orders"]
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, 0)
    )
    return o.select(
        "o_orderkey", "o_orderstatus",
        rnd(F.sum("o_totalprice").over(w)).alias("range_sum"),
    )


@query("q_window_analytic", oracle=f"""
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w_full AS quartile,
       {sql_rnd('percent_rank() OVER w_full', 6)} AS pct_rank,
       {sql_rnd('cume_dist() OVER w_full', 6)} AS cdist,
       first_value(c_custkey) OVER w_full AS richest,
       last_value(c_custkey) OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
FROM customer
WINDOW w_full AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""")
def q_window_analytic(spark, sf):
    c = load_tables(spark, sf)["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_all = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("c_custkey").over(w).alias("richest"),
        F.last("c_custkey").over(w_all).alias("poorest"),
    )


@query("q_window_running_total", oracle=f"""
SELECT o_custkey, o_orderkey,
       {sql_rnd('''sum(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_spend
FROM orders
""")
def q_window_running_total(spark, sf):
    o = load_tables(spark, sf)["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        rnd(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )
