"""Extended relational surface: pivot/unpivot, scalar/correlated/IN
subqueries, CTEs, null-handling aggregates — the long tail a user of
a full analytics engine expects beyond the core checklist.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import dsum, rnd, sql_dsum, sql_rnd


@query("q_pivot", oracle=f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
FROM lineitem
GROUP BY l_returnflag
""")
def q_pivot(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.floor(F.col("l_quantity") * 10000 + F.lit(0.5)).cast("long")))
    )
    return p.select(
        "l_returnflag",
        (F.col("O").cast("double") / 10000).alias("qty_o"),
        (F.col("F").cast("double") / 10000).alias("qty_f"),
    )


@query("q_unpivot", oracle=f"""
WITH w AS (
    SELECT l_returnflag,
           {sql_dsum('l_quantity')} AS qty,
           {sql_dsum('l_extendedprice')} AS price
    FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, 'qty' AS measure, qty AS val FROM w
UNION ALL
SELECT l_returnflag, 'price' AS measure, price AS val FROM w
""")
def q_unpivot(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    w = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("qty"),
        dsum("l_extendedprice").alias("price"),
    )
    return w.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', qty, 'price', price) AS (measure, val)",
    )


@query("q_subquery_scalar", oracle=f"""
SELECT o_orderstatus,
       count(*) AS n_above_avg,
       {sql_rnd('avg(o_totalprice)')} AS avg_above
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""")
def q_subquery_scalar(spark, sf):
    load_tables(spark, sf)
    return spark.sql(f"""
        SELECT o_orderstatus,
               count(*) AS n_above_avg,
               {sql_rnd('avg(o_totalprice)')} AS avg_above
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
    """)


@query("q_subquery_exists", oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""")
def q_subquery_exists(spark, sf):
    """Correlated EXISTS — Catalyst decorrelates it into a left-semi
    join on the correlation key."""
    load_tables(spark, sf)
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """)


@query("q_subquery_in", oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (
    SELECT c_nationkey FROM customer
    GROUP BY c_nationkey HAVING count(*) >= 8)
""")
def q_subquery_in(spark, sf):
    load_tables(spark, sf)
    return spark.sql("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey IN (
            SELECT c_nationkey FROM customer
            GROUP BY c_nationkey HAVING count(*) >= 8)
    """)


@query("q_cte_chain", oracle=f"""
WITH nat_rev AS (
    SELECT n_name, {sql_dsum('o_totalprice')} AS rev, count(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name),
tot AS (SELECT sum(rev) AS total FROM nat_rev)
SELECT n_name, rev, n,
       {sql_rnd('rev / total', 6)} AS rev_share
FROM nat_rev CROSS JOIN tot
""")
def q_cte_chain(spark, sf):
    load_tables(spark, sf)
    return spark.sql(f"""
        WITH nat_rev AS (
            SELECT n_name, {sql_dsum('o_totalprice')} AS rev, count(*) AS n
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name),
        tot AS (SELECT sum(rev) AS total FROM nat_rev)
        SELECT n_name, rev, n,
               {sql_rnd('rev / total', 6)} AS rev_share
        FROM nat_rev CROSS JOIN tot
    """)


@query("q_null_handling", oracle=f"""
SELECT o_orderstatus,
       count(*) AS n_rows,
       count(nullif(o_orderpriority, '3-MEDIUM')) AS n_not_medium,
       count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
       count(DISTINCT nullif(o_orderpriority, '3-MEDIUM')) AS n_distinct_other,
       {sql_rnd("avg(CASE WHEN o_orderpriority <> '3-MEDIUM' "
                "THEN o_totalprice END)")} AS avg_other_price
FROM orders
GROUP BY o_orderstatus
""")
def q_null_handling(spark, sf):
    o = load_tables(spark, sf)["orders"]
    not_med = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(not_med).alias("n_not_medium"),
        F.count(F.when(F.col("o_orderpriority") == "3-MEDIUM", 1)).alias("n_medium"),
        F.countDistinct(not_med).alias("n_distinct_other"),
        rnd(F.avg(F.when(F.col("o_orderpriority") != "3-MEDIUM",
                         F.col("o_totalprice")))).alias("avg_other_price"),
    )


@query("q_cte_recursive", oracle="""
WITH RECURSIVE chain(k, cur, depth) AS (
    SELECT o_orderkey, o_orderkey, 0 FROM orders
    UNION ALL
    SELECT k, cur // 10, depth + 1 FROM chain WHERE cur > 0
)
SELECT k, max(depth) AS depth FROM chain GROUP BY k
""")
def q_cte_recursive(spark, sf):
    """RECURSIVE CTE (new in Spark 4): walk the synthetic parent
    chain k → k div 10 until the root, then report each key's chain
    depth — the hierarchy/bill-of-materials traversal shape. The
    recursion is bounded (≤ log₁₀(max key) + 1 steps, ~7 here) and
    acyclic by construction, so UNION ALL recursion terminates in
    both engines with identical frontiers.

    Catalyst executes this as an iterative union of frontier plans —
    each step is a narrow projection+filter over the previous
    frontier, so at 100 TB the cost is (depth × one pass over the
    live frontier), which SHRINKS as chains terminate; no shuffle
    until the final aggregate. The same shape expresses org
    hierarchies, thread ancestry, and category trees."""
    load_tables(spark, sf)  # registers the `orders` temp view
    return spark.sql("""
WITH RECURSIVE chain(k, cur, depth) AS (
    SELECT o_orderkey, o_orderkey, 0 FROM orders
    UNION ALL
    SELECT k, cur DIV 10, depth + 1 FROM chain WHERE cur > 0
)
SELECT k, max(depth) AS depth FROM chain GROUP BY k
""")
