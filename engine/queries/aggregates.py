"""Aggregations (SURVEY.md §2.2 rows 16-23).

Hash-match discipline: money sums accumulate scaled BIGINTs (exact,
order-independent — see engine.queries.util), averages and
small-magnitude stats are quantized with the cross-engine ``rnd``.
Spark executes these as partial (map-side) + final hash aggregates;
nothing here shuffles more than once.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import dsum, rnd, sql_dsum, sql_rnd


@query("q_agg_pricing_summary", oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_rnd('avg(l_quantity)')} AS avg_qty,
       {sql_rnd('avg(l_extendedprice)')} AS avg_price,
       {sql_rnd('avg(l_discount)')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_agg_pricing_summary(spark, sf):
    """Flagship: TPC-H Q1 shape over lineitem."""
    li = load_tables(spark, sf)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            rnd(F.avg("l_quantity")).alias("avg_qty"),
            rnd(F.avg("l_extendedprice")).alias("avg_price"),
            rnd(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query("q_agg_having", oracle=f"""
SELECT o_custkey,
       {sql_dsum('o_totalprice')} AS total_spend,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING {sql_dsum('o_totalprice')} > 1000000
""")
def q_agg_having(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            dsum("o_totalprice").alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("total_spend") > 1000000)
    )


@query("q_agg_distinct", oracle="""
SELECT c_mktsegment,
       count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders,
       CAST(sum(DISTINCT c_nationkey) AS BIGINT) AS sum_nk
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def q_agg_distinct(spark, sf):
    t = load_tables(spark, sf)
    return (
        t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum_distinct(F.col("c_nationkey")).alias("sum_nk"),
        )
    )


@query("q_agg_approx_distinct")  # rows-only: HLL++ differs across engines by design
def q_agg_approx_distinct(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        # engine-side sanity: approximation within 10% of exact
        .withColumn(
            "within_10pct",
            (F.abs(F.col("approx_parts") - F.col("exact_parts"))
             <= 0.1 * F.col("exact_parts")),
        )
    )


@query("q_agg_rollup", oracle=f"""
SELECT r_name, n_name,
       {sql_dsum('o_totalprice')} AS total,
       count(*) AS n
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def q_agg_rollup(spark, sf):
    t = load_tables(spark, sf)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum("o_totalprice").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_agg_cube", oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {sql_dsum('o_totalprice')} AS total,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def q_agg_cube(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query("q_agg_grouping_sets", oracle=f"""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag) AS g_rf,
       grouping(l_linestatus) AS g_ls,
       {sql_dsum('l_quantity')} AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def q_agg_grouping_sets(spark, sf):
    load_tables(spark, sf)
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               {sql_dsum('l_quantity')} AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query("q_agg_stats", oracle=f"""
SELECT l_returnflag,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       {sql_rnd('stddev_samp(l_quantity)')} AS sd_qty,
       {sql_rnd('var_samp(l_quantity)')} AS var_qty,
       {sql_rnd('quantile_cont(l_quantity, 0.5)')} AS med_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_stats(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        rnd(F.stddev_samp("l_quantity")).alias("sd_qty"),
        rnd(F.var_samp("l_quantity")).alias("var_qty"),
        rnd(F.expr("percentile(l_quantity, 0.5)")).alias("med_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query("q_agg_mode", oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity AS v, count(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity),
r AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY cnt DESC, v DESC) AS rn
  FROM c)
SELECT l_returnflag, v AS mode_qty, cnt AS mode_n
FROM r WHERE rn = 1
""")
def q_agg_mode(spark, sf):
    """Deterministic per-group mode (most frequent value): value
    counts first, then one struct-argmax keyed (count, value) — ties
    on count resolve to the LARGEST value by definition, so both
    engines agree exactly (a bare ``mode()`` returns an arbitrary
    tied value and can never hash-match across engines; Spark's and
    DuckDB's tie choices differ by implementation).

    Scale: two partial-aggregable groupBys — the first shuffles
    (group, value) pairs with map-side combine (bounded by value
    cardinality per group, not rows), the second reduces each group
    to one struct. No sort, no window, no collect."""
    li = load_tables(spark, sf)["lineitem"]
    c = (li.groupBy("l_returnflag", F.col("l_quantity").alias("v"))
         .agg(F.count(F.lit(1)).alias("cnt")))
    return (
        c.groupBy("l_returnflag")
        .agg(F.max_by("v", F.struct("cnt", "v")).alias("mode_qty"),
             F.max("cnt").alias("mode_n"))
    )
