"""Sorts, limits, top-k, set operations (SURVEY.md §2.2 rows 30-35).

Top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows — no global sort); limit/offset keeps a total order
through a unique key so pagination is stable.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd, sql_rnd


@query("q_topk_orders", oracle=f"""
SELECT o_orderkey, {sql_rnd('o_totalprice')} AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""")
def q_topk_orders(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", rnd("o_totalprice").alias("price"))
    )


@query("q_limit_offset", oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders
ORDER BY o_orderkey
LIMIT 20 OFFSET 40
""")
def q_limit_offset(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return (
        o.orderBy("o_orderkey").offset(40).limit(20)
        .select("o_orderkey", "o_orderstatus")
    )


@query("q_union_all", oracle="""
SELECT c_nationkey AS nk FROM customer
UNION ALL
SELECT s_nationkey AS nk FROM supplier
""")
def q_union_all(spark, sf):
    t = load_tables(spark, sf)
    return t["customer"].select(F.col("c_nationkey").alias("nk")).unionAll(
        t["supplier"].select(F.col("s_nationkey").alias("nk")))


@query("q_union_distinct", oracle="""
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey AS nk FROM supplier
""")
def q_union_distinct(spark, sf):
    t = load_tables(spark, sf)
    return (
        t["customer"].select(F.col("c_nationkey").alias("nk"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nk")))
        .distinct()
    )


@query("q_intersect", oracle="""
SELECT c_nationkey AS nk FROM customer
INTERSECT ALL
SELECT s_nationkey AS nk FROM supplier
""")
def q_intersect(spark, sf):
    t = load_tables(spark, sf)
    return t["customer"].select(F.col("c_nationkey").alias("nk")).intersectAll(
        t["supplier"].select(F.col("s_nationkey").alias("nk")))


@query("q_except", oracle="""
SELECT c_nationkey AS nk FROM customer
EXCEPT ALL
SELECT s_nationkey AS nk FROM supplier
""")
def q_except(spark, sf):
    t = load_tables(spark, sf)
    return t["customer"].select(F.col("c_nationkey").alias("nk")).exceptAll(
        t["supplier"].select(F.col("s_nationkey").alias("nk")))
