"""Scalar function surface (SURVEY.md §2.2 rows 36-44):
string / date / math / conditional / cast / array / map / json.

All expressions are built-in pyspark.sql.functions (JVM-side, inside
WholeStageCodegen) — no Python in the row path. Array folds cast
float elements to double before multiplying so Spark and DuckDB do
identical IEEE arithmetic.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd, sql_rnd


@query("q_string_funcs", oracle=r"""
SELECT p_partkey,
       lower(p_name)  AS lname,
       upper(p_brand) AS ubrand,
       substring(p_name, 1, 5) AS pfx,
       length(p_name) AS len,
       concat_ws('-', p_brand, p_type) AS tag,
       replace(p_name, ' ', '_') AS snake,
       lpad(p_brand, 12, '*') AS padded,
       reverse(p_name) AS rev,
       trim(concat(' ', p_name, ' ')) AS trimmed,
       (p_name LIKE '%id%') AS has_id,
       regexp_extract(p_name, '(\w+)$', 1) AS last_word,
       string_split(p_name, ' ')[1] AS first_word
FROM part
""")
def q_string_funcs(spark, sf):
    p = load_tables(spark, sf)["part"]
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.length("p_name").alias("len"),
        F.concat_ws("-", "p_brand", "p_type").alias("tag"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.reverse("p_name").alias("rev"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.col("p_name").like("%id%").alias("has_id"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
    )


@query("q_date_funcs", oracle="""
SELECT o_orderkey,
       year(o_orderdate)  AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate)   AS dy,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus30,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
""")
def q_date_funcs(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).alias("days_since"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
    )


@query("q_math_funcs", oracle=f"""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 30000)                   AS dist,
       CAST(ceil(l_extendedprice) AS BIGINT)          AS ceil_p,
       CAST(floor(l_extendedprice) AS BIGINT)         AS floor_p,
       {sql_rnd('sqrt(l_extendedprice)')}             AS sqrt_p,
       {sql_rnd('ln(l_extendedprice)', 6)}            AS ln_p,
       {sql_rnd('log10(l_extendedprice)', 6)}         AS log10_p,
       {sql_rnd('exp(l_discount)', 6)}                AS exp_d,
       {sql_rnd('pow(l_quantity, 2)')}                AS qty_sq,
       CAST(sign(l_extendedprice - 30000) AS DOUBLE)  AS sgn,
       l_orderkey % 7                                 AS mod7
FROM lineitem
""")
def q_math_funcs(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("dist"),
        F.ceil("l_extendedprice").cast("long").alias("ceil_p"),
        F.floor("l_extendedprice").cast("long").alias("floor_p"),
        rnd(F.sqrt("l_extendedprice")).alias("sqrt_p"),
        rnd(F.log(F.col("l_extendedprice")), 6).alias("ln_p"),
        rnd(F.log10("l_extendedprice"), 6).alias("log10_p"),
        rnd(F.exp("l_discount"), 6).alias("exp_d"),
        rnd(F.pow("l_quantity", F.lit(2))).alias("qty_sq"),
        F.signum(F.col("l_extendedprice") - 30000).alias("sgn"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


@query("q_conditional", oracle=f"""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'partial' END AS status_word,
       coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'NONE') AS prio_or_none,
       {sql_rnd('greatest(o_totalprice, 100000.0)')} AS at_least_100k,
       {sql_rnd('least(o_totalprice, 100000.0)')}    AS at_most_100k,
       (o_orderstatus IS NOT DISTINCT FROM 'F') AS is_f,
       (NULL IS NOT DISTINCT FROM NULL) AS null_safe_true
FROM orders
""")
def q_conditional(spark, sf):
    o = load_tables(spark, sf)["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
         .when(F.col("o_orderstatus") == "O", "open")
         .otherwise("partial").alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")),
                   F.lit("NONE")).alias("prio_or_none"),
        rnd(F.greatest("o_totalprice", F.lit(100000.0))).alias("at_least_100k"),
        rnd(F.least("o_totalprice", F.lit(100000.0))).alias("at_most_100k"),
        F.col("o_orderstatus").eqNullSafe("F").alias("is_f"),
        F.lit(None).eqNullSafe(F.lit(None)).alias("null_safe_true"),
    )


@query("q_cast_types", oracle=f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS qty_str,
       CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec2,
       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
       CAST('42' AS INTEGER) AS const_int,
       CAST(l_linenumber AS DOUBLE) AS line_dbl
FROM lineitem
""")
def q_cast_types(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("int").cast("string").alias("qty_str"),
        F.col("l_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec2"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        F.lit("42").cast("int").alias("const_int"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@query("q_array_funcs", oracle=f"""
SELECT vec_id,
       len(embedding) AS dim,
       {sql_rnd('CAST(embedding[1] AS DOUBLE)', 6)} AS e1,
       {sql_rnd('CAST(list_max(embedding) AS DOUBLE)', 6)} AS emax,
       {sql_rnd('CAST(list_min(embedding) AS DOUBLE)', 6)} AS emin,
       {sql_rnd('''sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))''', 6)} AS l2,
       {sql_rnd('''list_sum(list_transform(embedding[1:8],
                   x -> CAST(x AS DOUBLE))) / 8''', 6)} AS head_avg
FROM embeddings
""")
def q_array_funcs(spark, sf):
    """Array fold surface — the einsum analogue of the reference's
    affine_to_field matvec (/root/reference/dask_stitch/local_affine.py:23)
    expressed with higher-order functions on array<float>."""
    e = load_tables(spark, sf)["embeddings"]
    sq_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    head_sum = F.aggregate(
        F.slice(F.col("embedding"), 1, 8), F.lit(0.0),
        lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        rnd(F.element_at("embedding", 1).cast("double"), 6).alias("e1"),
        rnd(F.array_max("embedding").cast("double"), 6).alias("emax"),
        rnd(F.array_min("embedding").cast("double"), 6).alias("emin"),
        rnd(F.sqrt(sq_sum), 6).alias("l2"),
        rnd(head_sum / 8, 6).alias("head_avg"),
    )


@query("q_explode_unnest", oracle=f"""
SELECT vec_id, i - 1 AS pos,
       {sql_rnd('CAST(embedding[i] AS DOUBLE)', 6)} AS val
FROM embeddings, generate_series(1, 8) AS t(i)
""")
def q_explode_unnest(spark, sf):
    e = load_tables(spark, sf)["embeddings"]
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .filter(F.col("pos") < 8)
        .select("vec_id", "pos", rnd(F.col("v").cast("double"), 6).alias("val"))
    )


@query("q_map_funcs", oracle=f"""
SELECT l_orderkey, l_linenumber,
       {sql_rnd('l_quantity')} AS qty_from_map,
       {sql_rnd('l_extendedprice')} AS price_from_map,
       2 AS n_keys
FROM lineitem
""")
def q_map_funcs(spark, sf):
    """Map construction/extraction; the oracle computes the same
    scalars without maps (DuckDB MAP internals differ)."""
    li = load_tables(spark, sf)["lineitem"]
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        rnd(F.element_at(m, F.lit("qty"))).alias("qty_from_map"),
        rnd(F.element_at(m, F.lit("price"))).alias("price_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query("q_json_funcs", oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_gt_50
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0
""")
def q_json_funcs(spark, sf):
    ev = load_tables(spark, sf)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    k2 = F.from_json("props", "k INT")["k"]
    return (
        ev.select("event_id", k.alias("k"), k2.alias("k2"))
        .filter(F.col("k") % 2 == 0)
        .select("event_id", "k", (F.col("k2") > 50).alias("k_gt_50"))
    )
