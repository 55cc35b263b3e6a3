"""Analytic-function extras: distribution ranks, bivariate statistics,
and text normalization — rounding out the window/aggregate surface
(SURVEY.md §2.2 extras).
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import rnd, sql_rnd


@query("q_window_ntile", oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4) OVER w AS tile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""")
def q_window_ntile(spark, sf):
    """Quartile assignment + distribution ranks per nation. The
    ordering carries a unique tiebreak (c_custkey) so ntile's bucket
    boundaries are engine-independent; percent_rank and cume_dist are
    exact rationals (int/int division) that both engines evaluate to
    the same IEEE double — no quantization needed. One window sort per
    nation partition; at 100 TB this is the canonical 'rank within
    shard' shape (the partition key carries the shuffle)."""
    c = load_tables(spark, sf)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey", "c_nationkey",
        F.ntile(4).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query("q_corr_stats", oracle=f"""
SELECT l_returnflag,
       {sql_rnd('corr(l_quantity, l_extendedprice)')} AS r,
       {sql_rnd('covar_samp(l_quantity, l_extendedprice)')} AS cov_s,
       {sql_rnd('covar_pop(l_quantity, l_extendedprice)')} AS cov_p
FROM lineitem GROUP BY l_returnflag
""")
def q_corr_stats(spark, sf):
    """Bivariate statistics per group (Pearson r, sample/population
    covariance) — the co-moment aggregates are algebraic (one
    map-side-combinable pass), the same scale shape as q_agg_stats.
    Values quantized with the engine's standard 1e-4 grid; both
    engines use pairwise co-moment accumulation over the same
    partition-parallel merges at fixture scale."""
    li = load_tables(spark, sf)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        rnd(F.corr("l_quantity", "l_extendedprice")).alias("r"),
        rnd(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_s"),
        rnd(F.covar_pop("l_quantity", "l_extendedprice")).alias("cov_p"),
    )


@query("q_rollup_time", oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       count(*) AS n
FROM orders GROUP BY ROLLUP (y, m)
""")
def q_rollup_time(spark, sf):
    """Calendar-hierarchy rollup (year → month → grand total) — the
    time-dimension twin of the categorical q_agg_rollup, i.e. a
    hypertable-style time rollup. Spark compiles ROLLUP to one Expand
    + partial/final aggregate: a single shuffle regardless of how many
    grouping sets the hierarchy adds."""
    o = load_tables(spark, sf)["orders"]
    return (
        o.select(F.year("o_orderdate").alias("y"),
                 F.month("o_orderdate").alias("m"))
        .rollup("y", "m")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("q_agg_approx_quantile")  # rows-only: sketch internals differ by engine
def q_agg_approx_quantile(spark, sf):
    """Approximate percentiles per group via Spark's relative-error
    quantile sketch (`approx_percentile`, KLL-style, mergeable) — the
    100 TB path for q_percentile_cont: map-side sketches merge
    associatively, no per-group sort. No oracle by design (sketch
    internals are engine-specific); tests/test_pipeline.py bounds the
    error against the exact percentiles instead."""
    li = load_tables(spark, sf)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5D, 1000)").alias("p50"),
        F.expr("approx_percentile(l_quantity, 0.9D, 1000)").alias("p90"),
    )


@query("q_text_clean", oracle="""
SELECT doc_id,
       substr(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), 1, 60) AS clean
FROM documents
""")
def q_text_clean(spark, sf):
    """Text normalization: lowercase, strip non-alphanumerics,
    collapse runs of spaces, trim — the first stage of every corpus
    cleaning recipe. Pure narrow projection (no shuffle, fully
    codegen'd JVM-side regex); prefix-limited output keeps the
    driver hash small."""
    d = load_tables(spark, sf)["documents"]
    clean = F.substring(
        F.trim(F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""),
            " +", " ")),
        1, 60)
    return d.select("doc_id", clean.alias("clean"))


_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]


@query("q_quantile_bins", oracle=f"""
WITH b AS (
  SELECT list_transform(
           quantile_cont(l_extendedprice, {_DECILES}),
           x -> floor(x * 10000 + 0.5) / 10000) AS bs
  FROM lineitem)
SELECT len(list_filter(bs, x -> l_extendedprice > x)) + 1 AS bin,
       count(*) AS n,
       {{lo}} AS lo, {{hi}} AS hi
FROM lineitem, b
GROUP BY 1
""".format(lo="(floor((min(l_extendedprice)) * 10000 + 0.5) / 10000)",
           hi="(floor((max(l_extendedprice)) * 10000 + 0.5) / 10000)"))
def q_quantile_bins(spark, sf):
    """Equal-frequency (decile) binning of a numeric feature — the
    feature-discretization shape in every training pipeline: decile
    boundaries fitted once, rows assigned to bins with a broadcast
    comparison, per-bin profiles emitted.

    Scale: the naive form (ntile over a global ORDER BY) is a
    single-reducer total sort — a scale-killer. Here the boundary
    fit is ONE exact percentile aggregate computing all nine cut
    points from a single mergeable counts-map buffer (nine separate
    percentile_disc aggregates each collected their own full value
    buffer — measured 12 s vs 2 s at sf0.1; at 100 TB swap in
    approx_percentile, the assignment plan is unchanged), the 1-row
    boundary array broadcasts to every task, and the bin id is a
    codegen ``size(filter(...))`` over 9 literals — the big side is
    never sorted or shuffled until the final |bins|-row aggregate.
    Cross-engine determinism: boundaries are quantized to the 1e-4
    grid before any comparison. For 2-decimal prices and decile p's
    the exact boundary*1e4 is an integer (the interpolation fraction
    has one decimal digit and hi-lo is a multiple of 0.01, so their
    product*1e4 is integral), so engines whose interpolation
    expressions differ by an ulp still quantize identically — UNLESS
    a boundary ever lands within an epsilon of a .5 grid edge, which
    the in-plan ``assert_true`` guard band turns into a loud failure
    instead of a silent hash flip.

    At-scale twin: set ``spark.engine.quantileBins.approx=true`` to
    fit boundaries with ``approx_percentile`` (mergeable sketch,
    map-side combine — the 100 TB path, where the exact counts-map
    buffer is value-cardinality-sized). Only the 9-literal fit
    aggregate changes; the broadcast + codegen bin ASSIGNMENT plan
    is identical (pinned in tests/test_plans_r5.py)."""
    li = load_tables(spark, sf)["lineitem"]
    ps = ", ".join(str(p) for p in _DECILES)
    approx = (str(spark.conf.get(
        "spark.engine.quantileBins.approx", "false")).lower() == "true")
    fit = (f"approx_percentile(l_extendedprice, array({ps}), 100000)"
           if approx else f"percentile(l_extendedprice, array({ps}))")
    # fit ONCE (a second reference to the aggregate expression would
    # make Catalyst evaluate the whole percentile buffer twice —
    # measured 2x the key's wall time), then guard + quantize in a
    # projection over the 1-row result.
    raw = F.col("raw")
    # guard band: every pre-quantization boundary must sit > 1e-6 grid
    # units from a .5 rounding edge; when() forces the assert to be
    # evaluated inside the projection so Catalyst cannot prune it.
    guarded = F.when(
        F.assert_true(
            F.forall(raw, lambda b: F.abs(
                (b * 10000 - F.floor(b * 10000)) - 0.5) > F.lit(1e-6)),
            F.lit("quantile boundary inside quantization guard band"),
        ).isNull(),
        F.transform(raw, lambda b: F.floor(b * 10000 + F.lit(0.5)) / 10000),
    )
    bnd = li.agg(F.expr(fit).alias("raw")).select(guarded.alias("bs"))
    x = F.col("l_extendedprice")
    return (
        li.crossJoin(F.broadcast(bnd))
        .select(
            (F.size(F.filter("bs", lambda b: x > b)) + 1).alias("bin"),
            x.alias("v"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"),
             rnd(F.min("v")).alias("lo"),
             rnd(F.max("v")).alias("hi"))
    )
