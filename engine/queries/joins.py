"""Joins (SURVEY.md §2.2 rows 6-15).

Scale notes: dimension tables (region/nation/part/customer at TPC-H
ratios) ride explicit ``F.broadcast`` hints — the Spark analogue of
the reference's ``delayed(affines)`` side-input
(/root/reference/dask_stitch/local_affine.py:124). Fact-fact joins
stay sort-merge/shuffle-hash on their equi-keys and benefit from AQE
skew splitting. The theta/interval joins keep the small side literal
so Spark picks BroadcastNestedLoopJoin rather than a cartesian
shuffle.
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import dsum, rnd, sql_dsum, sql_rnd


@query("q_join_inner", oracle=f"""
SELECT r_name,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def q_join_inner(spark, sf):
    t = load_tables(spark, sf)
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


@query("q_join_broadcast", oracle=f"""
SELECT p_brand,
       count(*) AS n,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_rnd('avg(l_extendedprice)')} AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""")
def q_join_broadcast(spark, sf):
    t = load_tables(spark, sf)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sum_qty"),
            rnd(F.avg("l_extendedprice")).alias("avg_price"),
        )
    )


@query("q_join_left", oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""")
def q_join_left(spark, sf):
    t = load_tables(spark, sf)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query("q_join_full", oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS c_cnt FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS s_cnt FROM supplier GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey, c_cnt, s_cnt
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""")
def q_join_full(spark, sf):
    t = load_tables(spark, sf)
    c = t["customer"].groupBy(F.col("c_nationkey").alias("cnk")).agg(
        F.count(F.lit(1)).alias("c_cnt"))
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("snk")).agg(
        F.count(F.lit(1)).alias("s_cnt"))
    return (
        c.join(s, F.col("cnk") == F.col("snk"), "full")
        .select(
            F.coalesce("cnk", "snk").alias("nationkey"), "c_cnt", "s_cnt")
    )


@query("q_join_semi", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""")
def q_join_semi(spark, sf):
    t = load_tables(spark, sf)
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query("q_join_anti", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def q_join_anti(spark, sf):
    t = load_tables(spark, sf)
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query("q_join_cross", oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""")
def q_join_cross(spark, sf):
    t = load_tables(spark, sf)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query("q_join_theta_range", oracle=f"""
SELECT b.band,
       count(*) AS n,
       {sql_dsum('l.l_extendedprice')} AS total
FROM lineitem l
JOIN (VALUES (0, 0.0, 20000.0), (1, 20000.0, 40000.0),
             (2, 40000.0, 70000.0), (3, 70000.0, 1e18)) AS b(band, lo, hi)
  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
""")
def q_join_theta_range(spark, sf):
    t = load_tables(spark, sf)
    bands = spark.createDataFrame(
        [(0, 0.0, 20000.0), (1, 20000.0, 40000.0),
         (2, 40000.0, 70000.0), (3, 70000.0, 1e18)],
        "band INT, lo DOUBLE, hi DOUBLE",
    )
    li = t["lineitem"]
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("total"))
    )


@query("q_join_asof", oracle="""
SELECT o_orderkey, o_custkey,
       lag(o_orderkey) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
""")
def q_join_asof(spark, sf):
    """As-of self-join: each order matched to the same customer's most
    recent prior order. Spark has no native ASOF JOIN; the equivalent
    single-shuffle plan is a window lag over (key, time) — strictly
    better than the naive range self-join at scale."""
    o = load_tables(spark, sf)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@query("q_join_interval", oracle=f"""
WITH iv AS (
    SELECT i AS interval_id,
           TIMESTAMP '2024-01-01' + to_days(CAST(7 * i AS INT))     AS lo,
           TIMESTAMP '2024-01-01' + to_days(CAST(7 * (i+1) AS INT)) AS hi
    FROM generate_series(0, 4) AS t(i))
SELECT interval_id, count(*) AS n, {sql_dsum('value')} AS sum_value
FROM events JOIN iv ON ts >= iv.lo AND ts < iv.hi
GROUP BY interval_id
""")
def q_join_interval(spark, sf):
    t = load_tables(spark, sf)
    iv = spark.range(0, 5).select(
        F.col("id").cast("int").alias("interval_id"),
        F.expr("TIMESTAMP '2024-01-01' + make_interval(0,0,0,CAST(7*id AS INT))").alias("lo"),
        F.expr("TIMESTAMP '2024-01-01' + make_interval(0,0,0,CAST(7*(id+1) AS INT))").alias("hi"),
    )
    ev = t["events"]
    return (
        ev.join(F.broadcast(iv), (ev.ts >= iv.lo) & (ev.ts < iv.hi))
        .groupBy("interval_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


@query("q_mjoin_topk", oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q_mjoin_topk(spark, sf):
    """TPC-H-Q3-shaped multi-join analytics composite: dimension
    filter -> two-fact join -> grouped revenue -> global top-10.
    This is the plan-quality showcase: the c_mktsegment and date
    predicates push into the scans, the customer side broadcasts
    under AQE, orders⋈lineitem shuffles BOTH sides on the SAME key
    (o_orderkey = l_orderkey) so the revenue groupBy that follows
    reuses the lineitem-side partitioning instead of re-shuffling,
    and the top-10 is TakeOrderedAndProject (per-partition heap,
    10-row driver merge — never a global sort). Revenue accumulates
    via the scaled-BIGINT exact-sum convention. At 100 TB both fact
    sides grow; the shape survives because every data-sized exchange
    is keyed by the join/group key and AQE coalesces/splits the
    post-shuffle partitions."""
    t = load_tables(spark, sf)
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    orders = t["orders"].where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
                 "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice")
                  * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
    )


_W_US = 60_000_000  # 1-minute co-occurrence window


@query("q_join_time_range", oracle=f"""
WITH e AS (SELECT event_id, user_id, event_type,
                  epoch_ns(ts) // 1000 AS us FROM events)
SELECT a.event_type, count(*) AS n_pairs
FROM e a JOIN e b
  ON a.event_type = b.event_type
 AND a.event_id < b.event_id
 AND a.user_id <> b.user_id
 AND abs(a.us - b.us) <= {_W_US}
GROUP BY a.event_type
""")
def q_join_time_range(spark, sf):
    """Large-to-large range self-join: count cross-user event pairs
    of the same type within a 1-minute window (the co-occurrence /
    burst-correlation shape). This is the 1-D twin of the geo cell
    join: time is discretized into window-sized cells, one side is
    emitted into its 3-cell neighborhood, and the join runs on
    (event_type, cell) — so candidate pairs are generated by bucket
    CO-LOCATION, never by a nested-loop range predicate over two
    unbounded sides. The exact |Δt| predicate then prunes the ring,
    and each true pair matches exactly one of the three cell copies
    (cells differ by at most 1 when |Δt| ≤ W, and the copies are
    distinct cells). Both sides shuffle once on the same compound
    key; a hot (type, minute) burst is AQE-split. The oracle is the
    brute inequality self-join — identical pairs, identical counts.
    Pair totals are density-quadratic by definition; the bucketing
    keeps the JOIN's work proportional to the true pair count."""
    ev = load_tables(spark, sf)["events"]
    e = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"),
    ).withColumn("cell", F.floor(F.col("us") / _W_US).cast("long"))
    a = e.select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"),
        "event_type", F.col("us").alias("a_us"), "cell")
    b = e.select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"),
        "event_type", F.col("us").alias("b_us"),
        F.explode(F.array(F.col("cell") - 1, F.col("cell"),
                          F.col("cell") + 1)).alias("cell"))
    return (
        a.join(b, ["event_type", "cell"])
        .where((F.col("a_id") < F.col("b_id"))
               & (F.col("a_user") != F.col("b_user"))
               & (F.abs(F.col("a_us") - F.col("b_us")) <= F.lit(_W_US)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query("q_mjoin_volume", oracle=f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 2)} AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""")
def q_mjoin_volume(spark, sf):
    """TPC-H Q5-shaped local-supplier volume: six-table star join
    (region→nation→supplier, customer→orders→lineitem, plus the
    same-nation colocation predicate) aggregating revenue per
    nation. The optimizer showcase of the join surface: Catalyst
    reorders the dimension chain, broadcasts every dim side
    (region/nation/supplier/customer all ≪ the fact), and the ONLY
    data-sized exchange left is lineitem→orders — at 100 TB the
    plan is one fact-fact shuffle plus broadcast hash joins, which
    the plan test pins (≥4 broadcast joins, ≤1 sort-merge join).

    Revenue uses the engine's scaled-BIGINT exact-sum helper
    (dsum/sql_dsum at cent grain) so the 6-way join's row order can
    never flip a hash bit."""
    t = load_tables(spark, sf)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (t["region"].filter(F.col("r_name") == "ASIA")
         .join(t["nation"],
               F.col("n_regionkey") == F.col("r_regionkey"))
         .join(t["supplier"],
               F.col("s_nationkey") == F.col("n_nationkey"))
         .join(t["lineitem"],
               F.col("l_suppkey") == F.col("s_suppkey"))
         .join(t["orders"],
               F.col("o_orderkey") == F.col("l_orderkey"))
         .join(t["customer"],
               (F.col("c_custkey") == F.col("o_custkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey"))))
    return (
        j.groupBy("n_name")
        .agg(dsum(rev, 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


#: Max staleness (days) for the tolerance-bounded as-of join; 30
#: keeps all three branches live on the fixtures (~13% of orders
#: have a prior order within 30 days, ~87% beyond, plus each
#: customer's first order with no prior at all).
_ASOF_TOL_DAYS = 30


@query("q_join_asof_tolerance", oracle=f"""
WITH x AS (
    SELECT o_orderkey, o_custkey, o_orderdate,
           lag(o_orderkey) OVER w AS pk,
           lag(o_orderdate) OVER w AS pd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey))
SELECT o_orderkey, o_custkey,
       CASE WHEN pd IS NOT NULL
                 AND date_diff('day', pd, o_orderdate)
                     <= {_ASOF_TOL_DAYS}
            THEN pk END AS prev_orderkey,
       CASE WHEN pd IS NOT NULL
                 AND date_diff('day', pd, o_orderdate)
                     <= {_ASOF_TOL_DAYS}
            THEN CAST(date_diff('day', pd, o_orderdate) AS BIGINT)
            END AS gap_days
FROM x
""")
def q_join_asof_tolerance(spark, sf):
    """TOLERANCE-bounded as-of join (pandas merge_asof(tolerance=...),
    kdb wj) — the staleness-aware variant q_join_asof lacks: each
    order matches the same customer's most recent prior order ONLY
    if it is at most {_ASOF_TOL_DAYS} days old; a staler match is
    worse than no match (a feature-store lookup serving a 2-year-old
    feature silently poisons the model — LEFT semantics keep the
    row, NULL the feature, and publish the gap so the join is
    auditable). Same single-shuffle window-lag plan as q_join_asof
    (Spark has no native ASOF JOIN; the lag formulation beats the
    naive range self-join at any scale), plus one codegen CASE —
    the tolerance costs nothing."""
    o = load_tables(spark, sf)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pk = F.lag("o_orderkey").over(w)
    pd_ = F.lag("o_orderdate").over(w)
    gap = F.datediff("o_orderdate", pd_)
    ok = pd_.isNotNull() & (gap <= _ASOF_TOL_DAYS)
    return o.select(
        "o_orderkey", "o_custkey",
        F.when(ok, pk).alias("prev_orderkey"),
        F.when(ok, gap.cast("long")).alias("gap_days"),
    )


@query("q_join_asof_forward", oracle="""
SELECT o_orderkey, o_custkey,
       lead(o_orderkey) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
""")
def q_join_asof_forward(spark, sf):
    """FORWARD-direction as-of join (pandas merge_asof(
    direction='forward')): each order matched to the same customer's
    EARLIEST SUBSEQUENT order — the shape of "next purchase after
    this touchpoint" attribution and forward-fill feature joins.
    Identical single-shuffle window plan to q_join_asof with lead in
    place of lag (Spark has no native ASOF JOIN in either direction;
    the window formulation beats the naive range self-join at any
    scale). Together with q_join_asof (backward), q_join_asof_nearest
    and q_join_asof_tolerance this completes the merge_asof direction
    surface."""
    o = load_tables(spark, sf)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query("q_join_asof_nearest", oracle="""
WITH x AS (
    SELECT o_orderkey, o_custkey, o_orderdate,
           lag(o_orderkey)   OVER w AS pk,
           lag(o_orderdate)  OVER w AS pd,
           lead(o_orderkey)  OVER w AS nk,
           lead(o_orderdate) OVER w AS nd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey))
SELECT o_orderkey, o_custkey,
       CASE WHEN pd IS NULL AND nd IS NULL THEN NULL
            WHEN nd IS NULL OR (pd IS NOT NULL
                 AND date_diff('day', pd, o_orderdate)
                     <= date_diff('day', o_orderdate, nd))
            THEN pk ELSE nk END AS match_orderkey,
       CASE WHEN pd IS NULL AND nd IS NULL THEN NULL
            WHEN nd IS NULL OR (pd IS NOT NULL
                 AND date_diff('day', pd, o_orderdate)
                     <= date_diff('day', o_orderdate, nd))
            THEN CAST(date_diff('day', pd, o_orderdate) AS BIGINT)
            ELSE CAST(date_diff('day', o_orderdate, nd) AS BIGINT)
            END AS gap_days,
       CASE WHEN pd IS NULL AND nd IS NULL THEN NULL
            WHEN nd IS NULL OR (pd IS NOT NULL
                 AND date_diff('day', pd, o_orderdate)
                     <= date_diff('day', o_orderdate, nd))
            THEN 'prior' ELSE 'next' END AS matched_dir
FROM x
""")
def q_join_asof_nearest(spark, sf):
    """NEAREST-direction as-of join (pandas merge_asof(
    direction='nearest')): each order matched to the same customer's
    temporally CLOSEST other order, prior or subsequent, with the
    deterministic tie rule gap_prior <= gap_next → prior (the
    backward match is the one that was actually observable at event
    time, so ties resolve to the causally-safe side). Publishes the
    winning key, its absolute gap in days, and the direction so the
    join is auditable. One window exchange computes BOTH neighbors
    (lag and lead share the window spec, so Catalyst evaluates them
    in a single Window operator over a single sort) — the same
    single-shuffle cost as the one-direction keys; the direction
    arbitration is pure codegen CASE on top."""
    o = load_tables(spark, sf)["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pk, pd_ = F.lag("o_orderkey").over(w), F.lag("o_orderdate").over(w)
    nk, nd = F.lead("o_orderkey").over(w), F.lead("o_orderdate").over(w)
    gb = F.datediff(F.col("o_orderdate"), pd_)
    gf = F.datediff(nd, F.col("o_orderdate"))
    # three-valued: NULL when no neighbor at all; True → prior wins
    take_prior = (
        F.when(pd_.isNull() & nd.isNull(), F.lit(None).cast("boolean"))
        .when(nd.isNull() | (pd_.isNotNull() & (gb <= gf)), F.lit(True))
        .otherwise(F.lit(False))
    )
    return o.select(
        "o_orderkey", "o_custkey",
        F.when(take_prior, pk).when(~take_prior, nk)
         .alias("match_orderkey"),
        F.when(take_prior, gb.cast("long"))
         .when(~take_prior, gf.cast("long")).alias("gap_days"),
        F.when(take_prior, F.lit("prior"))
         .when(~take_prior, F.lit("next")).alias("matched_dir"),
    )
