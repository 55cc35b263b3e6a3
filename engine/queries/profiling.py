"""Data-quality & profiling operators (round 5).

The warehouse-hygiene surface a 100 TB ingest pipeline runs before
anything else touches the data:

- ``q_profile_columns`` — one-pass per-column profile (null count,
                          exact distinct count, min/max) unpivoted to
                          one row per column.
- ``q_dq_audit``        — a Deequ-style rule audit: referential
                          integrity, primary-key uniqueness, value
                          ranges, cross-table reconciliation; one row
                          per rule with its violation count.
- ``q_linreg_group``    — exact per-group OLS (slope/intercept/r2)
                          from scaled-BIGINT sufficient statistics —
                          the "does price scale with quantity per
                          segment" regression shape.

The reference (GFleishman/dask_stitch, stitch.py:7-121,
local_affine.py:7-139) has no profiling/audit surface; these extend
the engine the way its §5.2 invariants extend correctness checking —
the same platform needs them the moment data arrives continuously.

All oracle-checked. Sums follow the engine's exact-integer
convention (engine/queries/util.py): counts via count(*)-count(col)
(never sum(CASE) — DuckDB widens that to HUGEINT), money in scaled
BIGINT cents, regression sufficient statistics cast to DOUBLE before
any product so both engines run the identical IEEE expression tree.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd, sql_rnd, sum128

# (column, kind) pairs profiled by q_profile_columns; numeric columns
# get min/max, categoricals get NULL there (mixed-type min/max as
# strings would hinge on engine float-formatting — not hash-safe).
_PROF_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROF_CAT = ["l_returnflag", "l_linestatus"]


def _prof_oracle() -> str:
    parts = []
    for c in _PROF_NUM:
        parts.append(f"""
SELECT '{c}' AS col_name,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       {sql_rnd(f'min({c})', 4)} AS min_val,
       {sql_rnd(f'max({c})', 4)} AS max_val
FROM lineitem""")
    for c in _PROF_CAT:
        parts.append(f"""
SELECT '{c}' AS col_name,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_val,
       CAST(NULL AS DOUBLE) AS max_val
FROM lineitem""")
    return " UNION ALL ".join(parts)


@query("q_profile_columns", oracle=_prof_oracle())
def q_profile_columns(spark, sf):
    """One-pass table profiler: every column's null count, exact
    distinct count, and numeric min/max, computed in a SINGLE
    aggregate over one scan and unpivoted with ``stack`` to one row
    per column (the profiling UI shape).

    Scale: one scan, no joins. The n exact count(distinct)s expand
    the aggregate n-fold (Spark's Expand node) — the deliberate
    exactness trade at fixture scale. Null counts ride the same
    partial aggregate for free. The result is |columns| rows —
    driver-sized regardless of data scale.

    At-scale twin (the q_quantile_bins twin discipline): with
    ``spark.engine.profile.approx=true`` the distinct counts come
    from ``approx_count_distinct`` (HyperLogLog++, rsd=0.01) — ONE
    mergeable sketch per column in a single partial aggregate, NO
    Expand node (pinned in tests/test_plans_profiling.py), so at
    100 TB the profile costs one scan + |columns| sketches instead of
    an n-fold row expansion. Null counts and min/max are identical in
    both modes; the approx distincts are within the HLL rsd bound of
    exact (equality-within-bound pinned in the same test file)."""
    from ..io import spread
    # the n-fold Expand of the exact-distinct aggregate is the whole
    # cost and runs in the scan stage; spread() parallelizes it past
    # the 3-partition fixture layout (no-op at scale)
    li = spread(load_tables(spark, sf)["lineitem"]
                .select(*(_PROF_NUM + _PROF_CAT)))
    approx = (str(spark.conf.get(
        "spark.engine.profile.approx", "false")).lower() == "true")
    aggs = []
    for c in _PROF_NUM + _PROF_CAT:
        nd = (F.approx_count_distinct(c, rsd=0.01) if approx
              else F.countDistinct(c))
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            nd.alias(f"nd_{c}"),
        ]
    for c in _PROF_NUM:
        aggs += [rnd(F.min(c), 4).alias(f"mn_{c}"),
                 rnd(F.max(c), 4).alias(f"mx_{c}")]
    one = li.agg(*aggs)
    stack_args = []
    for c in _PROF_NUM:
        stack_args.append(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}")
    for c in _PROF_CAT:
        stack_args.append(
            f"'{c}', nn_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE)")
    n = len(_PROF_NUM) + len(_PROF_CAT)
    return one.selectExpr(
        f"stack({n}, {', '.join(stack_args)}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)")


@query("q_dq_audit", oracle="""
SELECT 'dup_lineitem_pk' AS rule, count(*) AS violations FROM (
    SELECT l_orderkey, l_linenumber FROM lineitem
    GROUP BY 1, 2 HAVING count(*) > 1)
UNION ALL
SELECT 'orphan_order_cust', count(*) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'neg_acctbal', count(*) FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT 'qty_out_of_range', count(*) FROM lineitem
WHERE l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'order_price_reconcile', count(*) FROM (
    SELECT o.o_orderkey
    FROM orders o JOIN (
        SELECT l_orderkey, sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                    AS BIGINT)) AS gross_cents
        FROM lineitem GROUP BY l_orderkey) l
      ON l.l_orderkey = o.o_orderkey
    WHERE abs(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
              - gross_cents) > CAST(floor(o.o_totalprice * 100 + 0.5)
                                    AS BIGINT) / 10)
""")
def q_dq_audit(spark, sf):
    """Declarative data-quality audit: one row per rule with its
    violation count — uniqueness, referential integrity, range, and a
    cross-table reconciliation (order header total vs the sum of its
    line gross amounts, 10% tolerance, exact cents arithmetic).

    Scale: each rule is an independent aggregate over one scan of its
    table; the orphan check is a broadcast anti join (customer keys
    are dimension-sized; at 100 TB fact-vs-fact integrity uses the
    bloom-pruned join, q_join_bloom); the reconciliation groups
    lineitem by its join key FIRST so the join input is order-sized,
    co-partitionable with orders on the same key. Every branch
    reduces to a single row before the union — the final frame is
    |rules| rows."""
    t = load_tables(spark, sf)
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]

    dup_pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n")).where("n > 1")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("dup_lineitem_pk").alias("rule"), "violations")
    )
    orphans = (
        orders.join(F.broadcast(cust.select("c_custkey")),
                    orders.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("orphan_order_cust").alias("rule"), "violations")
    )
    neg_bal = (
        cust.where("c_acctbal < 0")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("neg_acctbal").alias("rule"), "violations")
    )
    qty_rng = (
        li.where("l_quantity < 1 OR l_quantity > 50")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("qty_out_of_range").alias("rule"), "violations")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    gross = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                   .cast("long")).alias("gross_cents"))
    )
    reconcile = (
        orders.join(gross, orders.o_orderkey == gross.l_orderkey)
        .where(F.abs(cents - F.col("gross_cents")) > cents / F.lit(10))
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("order_price_reconcile").alias("rule"), "violations")
    )
    return dup_pk.unionAll(orphans).unionAll(neg_bal) \
                 .unionAll(qty_rng).unionAll(reconcile)


_OLS_SUMS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS DOUBLE) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS DOUBLE) AS sy,
       CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS DOUBLE) AS sxx,
       CAST(sum(CAST(l_quantity AS BIGINT)
                * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS DOUBLE) AS sxy,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS DOUBLE) AS syy
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


@query("q_linreg_group", oracle=f"""
WITH s AS ({_OLS_SUMS_SQL})
SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
       {sql_rnd('((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)) / 100.0', 6)}
           AS slope,
       {sql_rnd('((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0))'
                ' * sx) / n) / 100.0', 6)} AS intercept,
       {sql_rnd('((n * sxy - sx * sy) * (n * sxy - sx * sy)) / '
                'nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0)',
                6)} AS r2
FROM s
""")
def q_linreg_group(spark, sf):
    """Per-group closed-form OLS: extendedprice ~ quantity for every
    (returnflag, linestatus) segment, from exact sufficient statistics
    — the distributed regression shape (one pass, no iteration).

    n, Σx, Σy, Σx², Σxy, Σy² accumulate as exact BIGINTs (quantity is
    integral, price in cents), so the statistics are identical under
    any partitioning; slope/intercept/r² then evaluate one fixed
    double expression per group. The map-side partial aggregate means
    the shuffle carries |partitions|×|groups| rows of six longs — at
    100 TB this is the cheapest possible statistic, and adding
    features generalizes to the normal-equations matrix (d² sums per
    group, still one pass). The cents-product sums accumulate in
    DECIMAL(38,0) (exact to ~10^24 rows/group — Σy² crosses int64
    near 10^5 rows, see inline comment); the final double conversion
    matches DuckDB's HUGEINT → DOUBLE exactly below 2^53 and rounds
    identically above it."""
    li = load_tables(spark, sf)["lineitem"]
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    # 128-bit accumulation (util.sum128): Σy² crosses int64 near
    # 1e5 rows/group at cent grain, a hard ANSI error at the 10×
    # probe scale; DuckDB's BIGINT sum widens to HUGEINT natively,
    # so both engines take the identical exact-integer → double path.
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        sum128(y).alias("sy"),
        sum128(x * x).alias("sxx"),
        sum128(x * y).alias("sxy"),
        sum128(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    # nullif guards (q_ts_seasonal convention): a zero-variance
    # segment zeroes these denominators, and this ANSI config
    # hard-errors on ANY /0 — double included — rather than Inf/NaN
    slope = ((n * sxy - sx * sy)
             / F.nullif(n * sxx - sx * sx, F.lit(0.0)))
    return s.select(
        "l_returnflag", "l_linestatus", n.cast("long").alias("n"),
        rnd(slope / 100.0, 6).alias("slope"),
        rnd(((sy - slope * sx) / n) / 100.0, 6).alias("intercept"),
        rnd((n * sxy - sx * sy) * (n * sxy - sx * sy)
            / F.nullif((n * sxx - sx * sx) * (n * syy - sy * sy),
                       F.lit(0.0)), 6).alias("r2"),
    )


#: (relation, key) pairs graded by q_join_skew_report — the three
#: biggest fact-side join keys in the fixture star schema.
_SKEW_KEYS = [("lineitem", "l_orderkey"), ("orders", "o_custkey"),
              ("events", "user_id")]


def _skew_oracle() -> str:
    per = " UNION ALL ".join(
        f"SELECT '{rel}' AS rel, '{key}' AS key,"
        f" CAST(sum(n) AS BIGINT) AS n_rows,"
        f" CAST(count(*) AS BIGINT) AS n_keys,"
        f" CAST(max(n) AS BIGINT) AS max_rows FROM"
        f" (SELECT {key} AS k, count(*) AS n FROM {rel} GROUP BY k) c"
        for rel, key in _SKEW_KEYS)
    return f"""
WITH a AS ({per})
SELECT rel, key, n_rows, n_keys, max_rows,
       CAST(CAST(100 AS HUGEINT) * max_rows * n_keys // n_rows
            AS BIGINT) AS skew_x100,
       CAST(1000000 * max_rows // n_rows AS BIGINT) AS top_share_ppm,
       CAST(least(32, greatest(1,
            CAST(CAST(max_rows AS HUGEINT) * n_keys // n_rows
                 AS BIGINT))) AS BIGINT) AS salt_hint
FROM a
"""


@query("q_join_skew_report", oracle=_skew_oracle())
def q_join_skew_report(spark, sf):
    """Join-key SKEW diagnostics — the table a 100 TB join planner
    reads before choosing a strategy, completing the skew lane that
    q_join_salted executes and AQE handles at runtime: per (fact
    relation, join key) the row/key counts, the heaviest key's row
    count, the skew factor x100 (max over mean rows per key — 100
    means perfectly uniform), the heaviest key's corpus share in
    ppm, and a salt hint (the max/mean ratio clamped to [1, 32] —
    the nsalt q_join_salted's replication actually needs; 1 means
    don't salt). Plan-time salting needs plan-time evidence; this is
    that evidence as a first-class query.

    Arithmetic: max_rows * n_keys crosses 2^63 at 100 TB fact sizes
    (1e9 rows x 1e9 keys), so the skew products run in the 128-bit
    lane (decimal(38,0) on Spark, HUGEINT in the oracle — the
    q_token_budget prod128 rule); everything else is exact BIGINT.

    Scale: per relation ONE map-side-combinable count aggregate
    (|keys| rows out of the scan) collapsed immediately into a 1-row
    min/max/sum aggregate — the q_profile_columns shape; output is
    |graded keys| rows at any corpus size, and nothing joins."""
    t = load_tables(spark, sf)
    out = None
    for rel, key in _SKEW_KEYS:
        c = (t[rel].groupBy(F.col(key).alias("k"))
             .agg(F.count(F.lit(1)).alias("n")))
        a = (c.agg(F.sum("n").cast("long").alias("n_rows"),
                   F.count(F.lit(1)).cast("long").alias("n_keys"),
                   F.max("n").cast("long").alias("max_rows"))
             .select(F.lit(rel).alias("rel"), F.lit(key).alias("key"),
                     "n_rows", "n_keys", "max_rows"))
        out = a if out is None else out.unionByName(a)
    return out.select(
        "rel", "key", "n_rows", "n_keys", "max_rows",
        F.expr("CAST(CAST(100 AS DECIMAL(38,0)) * max_rows * n_keys"
               " div n_rows AS BIGINT)").alias("skew_x100"),
        F.expr("CAST(1000000 * max_rows div n_rows AS BIGINT)")
         .alias("top_share_ppm"),
        F.expr("CAST(least(32, greatest(1,"
               " CAST(CAST(max_rows AS DECIMAL(38,0)) * n_keys"
               " div n_rows AS BIGINT))) AS BIGINT)")
         .alias("salt_hint"),
    )
