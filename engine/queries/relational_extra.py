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


@query("q_grouped_topk_agg", oracle="""
WITH r AS (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey)
               AS rn
    FROM orders)
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM r WHERE rn <= 3
""")
def q_grouped_topk_agg(spark, sf):
    """Top-k per group WITHOUT a window, with a genuinely BOUNDED
    shuffle: an Arrow pass keeps each partition's local top-k per
    group (a local top-k is always a superset of the group's global
    top-k contributions from that partition — exact, not heuristic),
    so the exchange carries ≤ |partitions|·|groups|·k candidate rows;
    a tiny final aggregation merges candidates and re-slices. Same
    result as the rank-window oracle, but at 100 TB the window must
    shuffle and SORT every group's full row set, while this shape
    shuffles k rows per (partition, group).

    A naive ``collect_list + slice`` aggregate does NOT have this
    property — its partial aggregation ships each task's complete
    row list as the buffer; the slice only happens at the final
    stage. Measured at 10× before/after: the list-aggregate shuffled
    all 1.5M rows, this shape shuffles ≤ 480."""
    import pandas as pd

    o = load_tables(spark, sf)["orders"].select(
        "o_orderpriority", "o_orderkey", "o_totalprice")

    def local_topk(batches):
        best: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("o_orderpriority", sort=False):
                cand = sub if g not in best else pd.concat(
                    [best[g], sub], ignore_index=True)
                cand = cand.sort_values(
                    ["o_totalprice", "o_orderkey"],
                    ascending=[False, True]).head(3)
                best[g] = cand
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    cand = o.mapInPandas(
        local_topk,
        "o_orderpriority string, o_orderkey long, o_totalprice double")
    item = F.struct(
        (-F.col("o_totalprice")).alias("negp"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
    )
    top = (
        cand.groupBy("o_orderpriority")
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, 3).alias("t"))
        .select("o_orderpriority", F.posexplode("t").alias("pos", "e"))
    )
    return top.select(
        "o_orderpriority",
        F.col("e.k").alias("o_orderkey"),
        F.col("e.p").alias("o_totalprice"),
        (F.col("pos") + 1).alias("rn"),
    )


@query("q_histogram", oracle="""
SELECT l_returnflag,
       least(CAST(floor(l_quantity / 3) AS BIGINT), 16) AS bucket,
       count(*) AS n,
       min(l_quantity) AS lo,
       max(l_quantity) AS hi
FROM lineitem
GROUP BY 1, 2
""")
def q_histogram(spark, sf):
    """Equi-width histogram per group (17 buckets of width 3, last
    bucket open-ended): the profiling primitive behind optimizer
    statistics, data-quality dashboards, and drift monitors. Pure
    map-side-combinable aggregation — the histogram frame is
    |groups|×|buckets| regardless of table size, so at 100 TB this
    is one scan plus a tiny shuffle."""
    li = load_tables(spark, sf)["lineitem"]
    bucket = F.least(F.floor(F.col("l_quantity") / 3).cast("long"),
                     F.lit(16))
    return (
        li.groupBy("l_returnflag", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("l_quantity").alias("lo"),
             F.max("l_quantity").alias("hi"))
    )


@query("q_join_lateral", oracle="""
SELECT c_custkey, c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) o
""")
def q_join_lateral(spark, sf):
    """Correlated LATERAL subquery join: top-2 orders per customer,
    written as the SQL-standard lateral form (the per-row subquery a
    user would write) rather than a hand-rolled window. Catalyst
    DECORRELATES it (DecorrelateInnerQuery): the per-customer limit
    becomes a partitioned rank filter over ONE shuffled join — no
    per-row subquery execution ever happens, which is exactly why the
    lateral form is safe at 100 TB while a driver-side loop is not.
    The executed plan is pinned to a single decorrelated join in
    tests/test_plans_graph.py."""
    load_tables(spark, sf)
    return spark.sql("""
        SELECT c_custkey, c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2) o
    """)


@query("q_union_evolution", oracle="""
WITH a AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0),
b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 1),
u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT o_orderstatus,
       count(*) AS n,
       count(o_totalprice) AS with_price,
       count(o_orderpriority) AS with_prio
FROM u GROUP BY o_orderstatus
""")
def q_union_evolution(spark, sf):
    """Schema-evolution union: two snapshots of the same logical
    table written under DIFFERENT schema versions (an old file
    without o_orderpriority, a new file without o_totalprice) are
    combined with ``unionByName(allowMissingColumns=True)`` — Spark
    aligns columns by NAME and null-fills the gaps, which is how a
    100 TB table whose schema drifted across ingest epochs is read
    as one relation. Per-column presence counts prove the alignment.
    Scale: a union is plan-level concatenation — zero data movement
    before the final small aggregate; each snapshot's scan prunes to
    its own columns."""
    o = load_tables(spark, sf)["orders"]
    a = o.where("o_orderkey % 3 = 0").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    b = o.where("o_orderkey % 3 = 1").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("with_price"),
        F.count("o_orderpriority").alias("with_prio"),
    )


# ---------------------------------------------------------------- skyline
@query("q_skyline", oracle="""
SELECT p_partkey, p_brand, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
""")
def q_skyline(spark, sf):
    """Group-wise 2-D skyline (Pareto frontier): per brand, the parts
    not dominated on (minimize retail price, maximize size) — the
    'best trade-offs only' query shape (price/quality frontiers,
    cheapest-at-each-capacity catalogs).

    The oracle spells dominance as NOT EXISTS (quadratic — fine for
    DuckDB at fixture scale); the engine uses the O(n log n) sweep:
    aggregate max(size) per (brand, price), running strict-
    predecessor max over the price-ordered per-brand frame, then one
    co-partitioned join back.  A row survives iff no strictly
    cheaper row has >= its size AND it has the max size at its own
    price.  Scale: every step is keyed by brand (the window is
    PARTITIONed, never global); the window input is the aggregated
    (brand, price) frame, |distinct prices| << |rows|; the join back
    shares the (brand, price) exchange with the aggregate, so AQE
    plans one shuffle of the dimension frame and one of the data."""
    from pyspark.sql import Window as W

    p = (load_tables(spark, sf)["part"]
         .select("p_partkey", "p_brand", "p_retailprice", "p_size"))
    g = (p.groupBy("p_brand", "p_retailprice")
         .agg(F.max("p_size").alias("gmax")))
    w = (W.partitionBy("p_brand").orderBy("p_retailprice")
         .rowsBetween(W.unboundedPreceding, -1))
    g2 = g.select("p_brand", "p_retailprice", "gmax",
                  F.max("gmax").over(w).alias("m_lt"))
    return (
        p.join(g2, ["p_brand", "p_retailprice"])
        .filter((F.col("m_lt").isNull() | (F.col("m_lt") < F.col("p_size")))
                & (F.col("p_size") == F.col("gmax")))
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
    )
