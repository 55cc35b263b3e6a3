"""Incremental & sketch-assisted analytics (round 4).

- ``q_incr_agg``     — materialized-view delta maintenance: merge a
                       stored aggregate with the aggregate of new
                       rows; exact vs full recompute.
- ``q_heavy_hitters``— exact frequent-items via the two-pass
                       Misra-Gries shape: per-partition mergeable
                       sketch → candidate set → exact count of
                       candidates only. Final answer is exact and
                       partition-order independent.
- ``q_gap_fill``     — dense hourly grid per series + forward fill
                       (the time-series regularization shape).

All oracle-checked; aggregates use the scaled-BIGINT exact-sum
convention (engine/queries/util.py) so merge order never changes a
hash. These generalize beyond the reference surface
(GFleishman/dask_stitch stitch.py:7-121 computes a fixed stencil
pipeline; it has no incremental-refresh, frequency-sketch, or
time-series stage) — they are the operators the same data platform
needs once corpora update continuously.
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import prod128, rnd, sql_dsum, sql_rnd, sum128

_DELTA_PRED = "l_orderkey % 13 = 0"


@query("q_incr_agg", oracle=f"""
WITH allrows AS (
    SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice * 1.05
    FROM lineitem WHERE {_DELTA_PRED}
)
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM allrows GROUP BY l_returnflag, l_linestatus
""")
def q_incr_agg(spark, sf):
    """Materialized-view maintenance: a stored aggregate (the "MV")
    is refreshed by aggregating ONLY the delta batch and merging the
    two partial states — never rescanning the base table. Partial
    states keep sums as scaled BIGINTs, so state merge is exact
    integer addition and the refreshed MV hash-matches a full
    recompute (the oracle) bit-for-bit.

    At 100 TB this is the difference between an O(|Δ|) refresh and an
    O(|table|) rebuild; the merge input is 2×|groups| rows. count/sum/
    min/max merge trivially; avg derives from (n, sum) at read time.
    The delta here is a deterministic re-insert of keys ≡ 0 (mod 13)
    with a 5% price uplift, standing in for a late-arriving batch."""
    li = load_tables(spark, sf)["lineitem"]

    def partial(df):
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("l_quantity") * 10000.0 + F.lit(0.5))
                  .cast("long")).alias("sq"),
            F.sum(F.floor(F.col("l_extendedprice") * 10000.0 + F.lit(0.5))
                  .cast("long")).alias("sp"),
        )

    mv = partial(li)  # the stored MV state (scaled-long partials)
    delta = li.filter(F.expr(_DELTA_PRED)).withColumn(
        "l_extendedprice", F.col("l_extendedprice") * 1.05)
    refreshed = (
        mv.unionAll(partial(delta))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("n").alias("n"), F.sum("sq").alias("sq"),
             F.sum("sp").alias("sp"))
    )
    return refreshed.select(
        "l_returnflag", "l_linestatus", "n",
        (F.col("sq").cast("double") / 10000.0).alias("sum_qty"),
        (F.col("sp").cast("double") / 10000.0).alias("sum_price"),
    )


_MG_K = 256  # counters per partition → guarantee: superset of words
#              with global count > n/(K+1)


@query("q_heavy_hitters", oracle=f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
t AS (SELECT count(*) // {_MG_K + 1} + 1 AS thr FROM w)
SELECT word, cnt FROM c, t WHERE cnt >= thr
""")
def q_heavy_hitters(spark, sf):
    """EXACT frequent items without a full-vocabulary shuffle: the
    production two-pass shape for Zipf-heavy token streams.

    Pass 1 runs a mergeable Misra-Gries summary (K=256 counters)
    inside each partition via mapInPandas — per-batch value_counts
    merged into the counter table, clipped by subtracting the
    (K+1)-largest count (the Berinde et al. mergeable-summary rule),
    which guarantees every word with partition count > n_p/(K+1)
    survives. By pigeonhole, any word with GLOBAL count ≥
    n//(K+1)+1 must exceed that bound in ≥1 partition, so the union
    of per-partition candidates is a superset of the true answer.
    Pass 2 exact-counts ONLY the candidate words (broadcast semi
    join) and applies the threshold — so the result is exact and
    identical under ANY partitioning, even though the intermediate
    candidate set is not.

    At 100 TB: the tail vocabulary (billions of hapaxes) never
    reaches a shuffle — pass 1 moves ≤ K rows per partition, pass 2
    shuffles only candidate-word partial counts. Exactly two corpus
    scans total: the summary pass also emits per-partition word
    totals, so no separate count() scan is needed, and the tiny
    summary frame is checkpointed so the Python pass runs once."""
    spark_ = spark
    d = load_tables(spark_, sf)["documents"]
    # measured and deliberately NOT spread: the MG summary is an
    # Arrow pass whose per-task overhead grows with task count — a
    # same-session A/B measured the round-robin exchange as a clear
    # loss (OPTIMIZATION_r15.md)
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    summary = mg_summary(words)
    if spark_.sparkContext.getCheckpointDir() is not None:
        summary = summary.checkpoint(eager=True)
    else:
        summary = summary.localCheckpoint()
    total = summary.agg(F.sum("n")).collect()[0][0]
    thr = total // (_MG_K + 1) + 1
    cand = summary.filter(F.col("word").isNotNull()) \
                  .select("word").distinct()
    return (
        words.join(F.broadcast(cand), "word")
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
    )


# lazy-clip limit: exact counts accumulate until the table exceeds
# this, then one clip (subtract the (K+1)-largest, drop ≤0) shrinks it
# to ≤ K entries. Clipping lazily preserves the MG bound — each clip
# value c has ≥ K+1 entries ≥ c, so Σ clips ≤ n_p/(K+1) — while doing
# the O(vocab) work once per ~LIMIT distinct words, not per batch.
_MG_LIMIT = 8192


def mg_summary(words):
    """Pass 1 over Arrow batches (no pandas conversion): per-partition
    Misra-Gries candidates plus one (NULL, partition_word_count) row,
    so callers get candidates AND the corpus total from one scan. The
    candidate SET depends on partition layout; its superset guarantee
    does not."""
    import heapq
    from collections import Counter

    import pyarrow as pa
    import pyarrow.compute as pc

    def mg(batches):
        counters: Counter = Counter()
        seen = 0
        for rb in batches:
            col = rb.column(0)
            seen += len(col)
            vc = pc.value_counts(col)
            counters.update(dict(zip(
                vc.field("values").to_pylist(),
                (v.as_py() for v in vc.field("counts")))))
            if len(counters) > _MG_LIMIT:
                clip = heapq.nlargest(_MG_K + 1, counters.values())[-1]
                counters = Counter(
                    {w: c - clip for w, c in counters.items() if c > clip})
        if len(counters) > _MG_K:
            clip = heapq.nlargest(_MG_K + 1, counters.values())[-1]
            counters = Counter(
                {w: c - clip for w, c in counters.items() if c > clip})
        keys = list(counters.keys()) + [None]
        ns = [0] * (len(keys) - 1) + [seen]
        yield pa.RecordBatch.from_arrays(
            [pa.array(keys, type=pa.string()),
             pa.array(ns, type=pa.int64())], ["word", "n"])

    return words.mapInArrow(mg, "word string, n long")


def mg_candidates(words):
    """Candidate words only (compatibility wrapper over mg_summary)."""
    return (mg_summary(words).filter(F.col("word").isNotNull())
            .select("word").distinct())


def heavy_hitters(words, thr: int):
    """Pass 2: exact counts restricted to the broadcast candidate
    set, thresholded — exact under any partitioning of ``words``."""
    return (
        words.join(F.broadcast(mg_candidates(words)), "word")
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thr)
    )


_GT_K = 5  # ranks returned per group by q_group_topk_sketch

# ONE oracle for both the batch key and its streaming twin
# (q_stream_group_topk) — built from the same _GT_K so the two can
# never silently diverge on k. NULL-lang docs are excluded on both
# sides symmetrically (a null group can't be a join-recount
# candidate anyway).
GROUP_TOPK_ORACLE = f"""
WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word
           FROM documents WHERE lang IS NOT NULL),
c AS (SELECT lang, word, count(*) AS cnt FROM w GROUP BY lang, word),
r AS (SELECT lang, word, cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, word) AS rn
      FROM c)
SELECT lang, word, cnt, CAST(rn AS INT) AS rank
FROM r WHERE rn <= {_GT_K}
"""


def grouped_mg_summary(pairs):
    """Per-partition, PER-GROUP Misra-Gries summaries over Arrow
    batches of (grp, item): one K=256 counter table per group seen in
    the partition, batch counting via a two-column pandas groupby
    (no composite-key string concatenation — group or item values
    containing any separator byte, and null groups, cannot corrupt
    the counts; null groups are dropped), the same lazy-clip rule as
    :func:`mg_summary` applied per group. Emits candidate rows
    (grp, item) only — callers that need group totals count them in
    their own exact pass."""
    import heapq
    from collections import Counter

    import pyarrow as pa

    def clip(c: Counter) -> Counter:
        cv = heapq.nlargest(_MG_K + 1, c.values())[-1]
        return Counter({w: n - cv for w, n in c.items() if n > cv})

    def mg(batches):
        counters: dict[str, Counter] = {}
        for rb in batches:
            pdf = rb.to_pandas()
            gcol, icol = pdf.columns[0], pdf.columns[1]
            vc = pdf.groupby([gcol, icol], sort=False,
                             dropna=True).size()
            for (g, w), n in vc.items():
                c = counters.setdefault(g, Counter())
                c[w] += int(n)
                if len(c) > _MG_LIMIT:
                    counters[g] = clip(c)
        gs, items = [], []
        for g, c in counters.items():
            if len(c) > _MG_K:
                c = clip(c)
            for w in c:
                gs.append(g)
                items.append(w)
        yield pa.RecordBatch.from_arrays(
            [pa.array(gs, type=pa.string()),
             pa.array(items, type=pa.string())], ["grp", "item"])

    return pairs.mapInArrow(mg, "grp string, item string")


@query("q_group_topk_sketch", oracle=GROUP_TOPK_ORACLE)
def q_group_topk_sketch(spark, sf):
    """EXACT top-k most frequent words PER GROUP without shuffling
    the tail vocabulary — the grouped sibling of q_heavy_hitters and
    the per-domain/per-language token-frequency shape of corpus
    curation.

    Pass 1 (:func:`grouped_mg_summary`) keeps one mergeable
    Misra-Gries table per (partition, lang): by the same pigeonhole
    as the global key, any word with group-global count ≥
    n_g//(K+1)+1 survives in at least one partition, so the union of
    per-partition candidates is a superset of every group's true
    top-k whenever the k-th count clears that bound — a certificate
    pinned at every committed fixture scale in tests/test_incremental
    (K=256 leaves 3-9× margin, measured). Pass 2 exact-counts ONLY
    the broadcast candidates and ranks with a deterministic
    (cnt DESC, word ASC) row_number whose window input is
    candidate-sized (≤ partitions×groups×K rows), never
    vocabulary-sized.

    At 100 TB: the shuffle after pass 1 carries ≤ K rows per
    (partition, group); billions of hapaxes never leave their
    partition. A naive groupBy(lang, word) + window ranks the ENTIRE
    vocabulary through a shuffle and a sort — this plan ranks only
    provable candidates, exactly."""
    d = (load_tables(spark, sf)["documents"]
         .filter(F.col("lang").isNotNull()))
    words = d.select("lang", F.explode(F.split("text", " ")).alias("word"))
    summary = grouped_mg_summary(words)
    cand = (summary.select(F.col("grp").alias("lang"),
                           F.col("item").alias("word")).distinct())
    exact = (
        words.join(F.broadcast(cand), ["lang", "word"])
        .groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("word")))
    return (exact.withColumn("rank", rn)
            .filter(F.col("rank") <= _GT_K)
            .select("lang", "word", "cnt", "rank"))


_US_H = 3_600_000_000


@query("q_gap_fill", oracle=f"""
WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us, value
           FROM events),
b AS (SELECT event_type, (us // {_US_H}) * {_US_H} AS h,
             {sql_dsum('value')} AS v
      FROM e GROUP BY 1, 2),
bounds AS (SELECT event_type, min(h) AS lo, max(h) AS hi
           FROM b GROUP BY 1),
grid AS (SELECT event_type,
                unnest(generate_series(lo, hi, {_US_H})) AS h
         FROM bounds),
j AS (SELECT g.event_type, g.h, b.v
      FROM grid g LEFT JOIN b USING (event_type, h))
SELECT event_type, h AS hour_us,
       (v IS NULL) AS was_gap,
       last_value(v IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM j
""")
def q_gap_fill(spark, sf):
    """Time-series regularization: densify each series onto an hourly
    grid and forward-fill gaps with the last observed value — the
    prerequisite for any per-interval model feature or SLA metric
    over irregular event streams.

    Scale shape: the hourly aggregate is time-bounded (|series| ×
    |hours| rows — compact no matter how big the raw stream), the
    grid generates from a |series|-row bounds frame via sequence+
    explode (no driver loop), and the forward fill is one window
    per series. The only corpus-sized work is the first aggregation,
    which map-side combines before its single shuffle."""
    ev = load_tables(spark, sf)["events"]
    b = (
        ev.select(
            "event_type",
            ((F.unix_micros("ts") / _US_H).cast("long") * _US_H).alias("h"),
            "value")
        .groupBy("event_type", "h")
        .agg((F.sum(F.floor(F.col("value") * 10000.0 + F.lit(0.5))
                    .cast("long")).cast("double") / 10000.0).alias("v"))
    )
    bounds = b.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(_US_H))).alias("h"))
    j = grid.join(b, ["event_type", "h"], "left")
    w = (W.partitionBy("event_type").orderBy("h")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return j.select(
        "event_type", F.col("h").alias("hour_us"),
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("filled"),
    )


@query("q_anomaly_iqr", oracle=f"""
WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us, value
           FROM events),
b AS (SELECT event_type, (us // {_US_H}) * {_US_H} AS h,
             {sql_dsum('value')} AS v
      FROM e GROUP BY 1, 2),
f AS (SELECT event_type,
             quantile_disc(v, 0.25) AS q25,
             quantile_disc(v, 0.75) AS q75
      FROM b GROUP BY event_type)
SELECT b.event_type, b.h AS hour_us, b.v,
       f.q75 + 1.5 * (f.q75 - f.q25) AS fence_hi
FROM b JOIN f USING (event_type)
WHERE b.v > f.q75 + 1.5 * (f.q75 - f.q25)
""")
def q_anomaly_iqr(spark, sf):
    """Per-series anomaly detection with the Tukey IQR fence: hourly
    value sums per event_type, flagging hours above q75 + 1.5·IQR.
    DISCRETE quantiles (an actual element of the exactly-quantized
    hourly grid, no interpolation) keep the fence bit-identical in
    both engines, so even the boundary comparison is deterministic —
    a z-score variant would hinge on float stddev accumulation order.

    Scale shape: the hourly aggregate is time-bounded and compact;
    the per-series fence frame is |series|-sized and broadcast back.
    Nothing corpus-sized is sorted — quantiles run per series over
    the compact hourly frame."""
    ev = load_tables(spark, sf)["events"]
    b = (
        ev.select(
            "event_type",
            ((F.unix_micros("ts") / _US_H).cast("long") * _US_H).alias("h"),
            "value")
        .groupBy("event_type", "h")
        .agg((F.sum(F.floor(F.col("value") * 10000.0 + F.lit(0.5))
                    .cast("long")).cast("double") / 10000.0).alias("v"))
    )
    f = b.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v)").alias("q25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").alias("q75"),
    )
    fence = F.col("q75") + 1.5 * (F.col("q75") - F.col("q25"))
    return (
        b.join(F.broadcast(f), "event_type")
        .filter(F.col("v") > fence)
        .select("event_type", F.col("h").alias("hour_us"), "v",
                fence.alias("fence_hi"))
    )


@query("q_hll_rollup")  # rows-only by design: HLL estimates are
#                         engine-defined (like the ANN keys); the
#                         estimate-vs-exact bound is pinned in
#                         tests/test_incremental.py
def q_hll_rollup(spark, sf):
    """Mergeable-sketch rollup — the hypertable/OLAP-cube pattern for
    distinct counts at 100 TB: per-day HLL sketches of the user set
    are built once (``hll_sketch_agg``), stored at the fine grain,
    and any coarser rollup (here per event_type across all days)
    UNIONS the sketches (``hll_union_agg``) instead of rescanning raw
    events — distinct-count rollups become O(|days| x |sketch|) merges
    of ~KB-sized binaries rather than O(|events|) rescans, and late
    data only rebuilds its own day.

    Exact distinct (q_agg_distinct) needs the full value set per
    group and cannot pre-aggregate across grains; the sketch trades
    ~2% error for mergeability. Both aggregation levels are ordinary
    partial+final hash aggregates; nothing about the plan changes on
    a cluster."""
    ev = load_tables(spark, sf)["events"]
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"),
             F.count(F.lit(1)).alias("n_events"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
             .alias("est_users"),
             F.sum("n_events").alias("n_events"),
             F.count(F.lit(1)).alias("n_days"))
        .select("event_type", "est_users", "n_events", "n_days")
    )


_OHLC_H_US = 3_600_000_000  # 1-hour candles


@query("q_ts_ohlc", oracle=f"""
WITH e AS (
  SELECT event_type,
         (epoch_ns(ts) // 1000 // {_OHLC_H_US}) * {_OHLC_H_US} AS ws_us,
         epoch_ns(ts) // 1000 AS us, event_id, value
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, ws_us
                            ORDER BY us, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type, ws_us
                            ORDER BY us DESC, event_id DESC) AS rd
  FROM e)
SELECT event_type, ws_us,
       max(CASE WHEN ra = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rd = 1 THEN value END) AS close,
       count(*) AS n_ticks,
       {sql_dsum('value')} AS volume
FROM r GROUP BY event_type, ws_us
""")
def q_ts_ohlc(spark, sf):
    """OHLC candle resampling (the financial/hypertable downsample):
    per (series, hour) emit open (first value by event time), high,
    low, close (last value), tick count, and exact volume.

    Scale: ONE partial-aggregable groupBy — open/close are
    ``min_by``/``max_by`` over a (time, id) struct, so every candle
    reduces map-side to a constant-size state (first/last/min/max/
    count/scaled-sum) and the shuffle carries |series|x|candles|
    aggregate rows, never ticks. The window-sort spelling (the
    oracle's row_number) would shuffle and sort every tick; at 100 TB
    of tick data the struct-argmax aggregate is the difference
    between a candle table refresh and a full re-sort. Ties are
    impossible by construction ((us, event_id) is unique), so both
    engines pick the same open/close deterministically. Volume uses
    the engine's scaled-BIGINT sum convention."""
    from .util import dsum

    ev = load_tables(spark, sf)["events"]
    us = F.unix_micros("ts")
    e = ev.select(
        "event_type",
        ((us / F.lit(_OHLC_H_US)).cast("long") * _OHLC_H_US).alias("ws_us"),
        us.alias("us"), "event_id", "value",
    )
    key = F.struct("us", "event_id")
    return (
        e.groupBy("event_type", "ws_us")
        .agg(F.min_by("value", key).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             F.max_by("value", key).alias("close"),
             F.count(F.lit(1)).alias("n_ticks"),
             dsum("value").alias("volume"))
    )


@query("q_ts_autocorr", oracle="""
WITH o AS (
  SELECT event_type,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS x,
         lag(CAST(floor(value * 10000 + 0.5) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS xp
  FROM events),
p AS (SELECT event_type, x, xp FROM o WHERE xp IS NOT NULL),
s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(xp) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(xp * xp) AS DOUBLE) AS syy,
         CAST(sum(x * xp) AS DOUBLE) AS sxy
  FROM p GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       floor((n * sxy - sx * sy)
             / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)
             * 1000000 + 0.5) / 1000000 AS acf1
FROM s
""")
def q_ts_autocorr(spark, sf):
    """Lag-1 autocorrelation of the value series per event type —
    the first diagnostic of time-series structure (is this series
    noise, trend, or mean-reverting) that monitoring and
    forecast-readiness checks compute.

    The q_linreg_group sufficient-statistics discipline applied to a
    LAGGED pair stream: values quantize to exact scaled BIGINTs, one
    window produces (x_t, x_{t-1}) pairs with a deterministic
    (ts, event_id) order, and the six co-moment sums accumulate as
    exact integers cast to double only for the final Pearson
    expression — identical under any partitioning. Scale: one
    shuffle on the series key for the lag window, then a map-side-
    combinable aggregate; |series| output rows."""
    e = load_tables(spark, sf)["events"]
    xi = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    wl = W.partitionBy("event_type").orderBy("ts", "event_id")
    o = e.select("event_type", xi.alias("x"),
                 F.lag(xi).over(wl).alias("xp"))
    p = o.filter(F.col("xp").isNotNull())
    # 128-bit co-moment sums (util.sum128): x² ≤ 2.4e13 per row at
    # the 1e4 value scale, so an int64 sum crosses near 4e5
    # rows/group — the q_linreg_group cliff.
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("xp").cast("double").alias("sy"),
        sum128(F.col("x") * F.col("x")).alias("sxx"),
        sum128(F.col("xp") * F.col("xp")).alias("syy"),
        sum128(F.col("x") * F.col("xp")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # nullif guard: a constant series has zero variance — Spark
    # would yield NULL but DuckDB IEEE Inf/NaN; nullif on BOTH
    # sides makes the degenerate case NULL in both engines (the
    # q_ts_seasonal denominator convention)
    acf = ((n * sxy - sx * sy)
           / F.nullif(
               F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
               F.lit(0.0)))
    return s.select(
        "event_type", n.cast("long").alias("n_pairs"),
        rnd(acf, 6).alias("acf1"))


# ---------------------------------------------------------------- TWAP
@query("q_time_weighted_avg", oracle=f"""
WITH s AS (
  SELECT user_id, value, epoch_us(ts) AS t_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events),
w AS (
  SELECT user_id,
         CAST(nxt - t_us AS BIGINT) AS dt,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vs
  FROM s WHERE nxt IS NOT NULL)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_seg,
       CAST(sum(dt) AS BIGINT) AS dur_us,
       {sql_rnd("CAST(sum(vs * dt) AS DOUBLE) / 10000.0 / sum(dt)")}
           AS twap
FROM w GROUP BY 1
""")
def q_time_weighted_avg(spark, sf):
    """Time-weighted average value per user series (TWAP): each
    observation holds until the next one, so the mean weights every
    value by its holding duration — the correct average for
    irregularly sampled series where the arithmetic mean
    over-weights bursts.

    Scale: one PARTITIONed lead window keyed by the series (user)
    followed by one map-side-combined aggregate on the same key —
    AQE reuses the window's exchange for the groupBy, so the series
    shuffles once.  Weights are exact microsecond integers and
    values are quantized to scaled BIGINT before the weighted sum,
    making Σ v·dt order-independent integer arithmetic (the lag-pair
    discipline of q_ts_autocorr); ties order deterministically via
    event_id."""
    e = load_tables(spark, sf)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        F.floor(F.col("value") * 10000 + F.lit(0.5))
        .cast("long").alias("vs"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt"))
    seg = (s.filter(F.col("nxt").isNotNull())
           .select("user_id", "vs",
                   (F.col("nxt") - F.col("t_us")).alias("dt")))
    return (seg.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_seg"),
                 F.sum("dt").alias("dur_us"),
                 # prod128: vs·dt itself can cross int64 (a >6.4 h
                 # gap at large values), not just the sum — the
                 # multiply must already run in the 128-bit lane
                 rnd(F.sum(prod128(F.col("vs"), F.col("dt")))
                     .cast("double")
                     / 10000.0 / F.sum("dt")).alias("twap")))


# ------------------------------------------- mergeable t-digest sketch
TD_DELTA = 200  # compression: centroid count ~ O(delta); rank error
#                 ~ 4/delta near the median, tighter at the tails
#                 (k1 scale function concentrates centroids there)


def tdigest_path(sf: str) -> str:
    """Stable on-disk location of the persisted per-(event_type, day)
    t-digest artifact for one fixture dir (the ivf_codebook_path
    idiom: digest covers the events file's identity so a regenerated
    fixture re-sketches instead of serving stale centroids)."""
    import hashlib
    import os

    from .util import artifact_root

    p = os.path.join(os.path.abspath(sf), "events.parquet")
    st = os.stat(p)
    digest = hashlib.md5(
        f"{p}|{st.st_size}|{st.st_mtime_ns}|td{TD_DELTA}".encode()
    ).hexdigest()[:12]
    return os.path.join(artifact_root(), f"engine_tdigest_{digest}")


def _td_k(q):
    """k1 scale function: k(q) = δ/(2π)·asin(2q−1). A centroid may
    absorb weight while its k-span stays ≤ 1, which bounds centroid
    mass by ~2q(1−q)·total/δ — small near the tails, so extreme
    quantiles stay sharp."""
    import numpy as np

    return TD_DELTA / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1)


def _td_compress(means, weights):
    """One merging-t-digest pass (Dunning's merging variant): inputs
    sorted by (mean, weight) — deterministic regardless of partition
    or merge order — then greedily folded left-to-right while the
    k1-span of the growing centroid stays ≤ 1. Returns (means,
    weights) float64/int64 arrays."""
    import numpy as np

    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    order = np.lexsort((w, m))
    m, w = m[order], w[order]
    total = w.sum()
    om, ow = [], []
    cm, cw = m[0], w[0]
    before = 0.0  # weight strictly before the growing centroid
    for i in range(1, len(m)):
        q0 = before / total
        q2 = (before + cw + w[i]) / total
        if _td_k(q2) - _td_k(q0) <= 1.0:
            cw += w[i]
            cm += (m[i] - cm) * (w[i] / cw)
        else:
            om.append(cm)
            ow.append(cw)
            before += cw
            cm, cw = m[i], w[i]
    om.append(cm)
    ow.append(cw)
    return (np.asarray(om, dtype=np.float64),
            np.asarray(ow, dtype=np.int64))


def _td_quantile(means, weights, q):
    """Estimate the q-quantile from centroids: each centroid's mass
    is centered at its mean (midpoint rule), linear interpolation
    between adjacent midpoints, clamped to the extreme means."""
    import numpy as np

    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    total = w.sum()
    target = q * total
    cum = np.cumsum(w) - w / 2.0
    if target <= cum[0]:
        return float(m[0])
    if target >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, target))
    frac = (target - cum[i - 1]) / (cum[i] - cum[i - 1])
    return float(m[i - 1] + frac * (m[i] - m[i - 1]))


def _tdigest_daily(spark, sf):
    """Fit-or-load the fine-grain sketch table: one t-digest per
    (event_type, day), built distributed (applyInPandas per group,
    values sorted then compressed) and PERSISTED as a parquet
    artifact via the staging-dir + atomic-rename commit idiom of
    _ivf_codebook. Later calls — any rollup, any session — read the
    ~|types|×|days| row artifact and never rescan raw events."""
    import os
    import shutil

    import numpy as np
    import pandas as pd

    path = tdigest_path(sf)
    if not os.path.exists(path):
        ev = load_tables(spark, sf)["events"].select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "value")

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            v = np.sort(pdf["value"].to_numpy(np.float64))
            m, w = _td_compress(v, np.ones(len(v)))
            return pd.DataFrame([{
                "event_type": pdf["event_type"].iloc[0],
                "day": pdf["day"].iloc[0],
                "means": list(m), "weights": list(w),
                "n": len(v),
            }])

        daily = ev.groupBy("event_type", "day").applyInPandas(
            build,
            "event_type string, day string, means array<double>, "
            "weights array<long>, n long")
        staging = f"{path}.inprogress.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        daily.write.mode("overwrite").parquet(staging)
        try:
            os.rename(staging, path)      # atomic publish
        except OSError:                   # concurrent builder won
            shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(path)


@query("q_tdigest_quantile")  # rows-only by design: t-digest centroid
#                               placement is engine-defined (the
#                               q_hll_rollup precedent); the estimate-
#                               vs-exact rank-error bound is pinned in
#                               tests/test_r7_properties.py
def q_tdigest_quantile(spark, sf):
    """Mergeable t-digest quantile rollup — the second hypertable
    sketch next to q_hll_rollup, and the merge-across-grains story
    q_agg_approx_quantile's opaque KLL state can't show: per-
    (event_type, day) digests are built ONCE, persisted at the fine
    grain (:func:`_tdigest_daily`), and any coarser quantile — here
    p50/p90/p99 per event_type across all days — MERGES the stored
    centroids (concatenate, re-compress with the same k1 rule)
    instead of rescanning raw events. Quantile rollups become
    O(|days| × δ) centroid merges of ~KB rows; late data rebuilds
    only its own day's digest.

    Exact percentiles (q_percentile_cont) need a per-group sort of
    every value and cannot pre-aggregate across grains; the digest
    trades a bounded rank error (~4/δ near the median, tighter at
    the tails under the k1 scale function) for mergeability. Build
    and merge are deterministic — inputs are sorted by (mean,
    weight) before every compress pass — so the output is stable
    under any partitioning or merge order."""
    import numpy as np
    import pandas as pd

    daily = _tdigest_daily(spark, sf)

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.concatenate([np.asarray(x) for x in pdf["means"]])
        w = np.concatenate([np.asarray(x) for x in pdf["weights"]])
        mm, mw = _td_compress(m, w)

        def est(q):
            return np.floor(_td_quantile(mm, mw, q) * 1e4 + 0.5) / 1e4

        return pd.DataFrame([{
            "event_type": pdf["event_type"].iloc[0],
            "n": int(pdf["n"].sum()),
            "n_centroids": len(mm),
            "p50": est(0.5), "p90": est(0.9), "p99": est(0.99),
        }])

    return daily.groupBy("event_type").applyInPandas(
        roll,
        "event_type string, n long, n_centroids int, "
        "p50 double, p90 double, p99 double")


# ----------------------------------------------------- dyadic EWMA
_EWMA_K = 16  # window depth: alpha = 1/2 truncated at 16 lags


def _ewma_sql(k: int) -> tuple[str, str]:
    """(numerator, denominator) oracle SQL over k lag() terms with
    exact power-of-two weights, mirroring the Spark expressions."""
    num = " + ".join(
        f"coalesce(lag(cents, {i}) OVER w, 0) * {1 << (k - 1 - i)}"
        for i in range(k))
    den = " + ".join(
        f"(CASE WHEN lag(cents, {i}) OVER w IS NOT NULL"
        f" THEN {1 << (k - 1 - i)} ELSE 0 END)"
        for i in range(k))
    return num, den


_NUM_SQL, _DEN_SQL = _ewma_sql(_EWMA_K)


@query("q_ts_ewma", oracle=f"""
SELECT event_id, user_id,
       floor((CAST(({_NUM_SQL}) AS DOUBLE) / ({_DEN_SQL}) / 100.0)
             * 10000 + 0.5) / 10000 AS ewma
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_ts_ewma(spark, sf):
    """Exponentially weighted moving average per user series —
    alpha = 1/2 truncated at 16 observations. The weights
    2^(K-1-k) are exact powers of two and values are cent-quantized
    BIGINTs, so numerator and denominator are pure integer
    arithmetic and the single final division is one IEEE op on
    exact integers — bit-identical across engines with NO libm in
    the pipeline (pow/exp-based EWMA formulations are not
    cross-engine hash-safe; dyadic alpha is). Ramp-up handling: the
    denominator sums only the weights of PRESENT lags, so early
    rows are exact partial-window EWMAs rather than zero-padded.

    Scale: one window partition per user series, 16 lag
    expressions evaluated together over a single sort within the
    one exchange — the standard time-series smoothing pass; no
    self-join, no per-row Python. A recursive ewma(t) =
    f(ewma(t-1)) needs sequential state; the truncated form is the
    embarrassingly-window-parallel equivalent (weight below 2^-16
    of the head is beneath the output quantum anyway)."""
    e = load_tables(spark, sf)["events"].select(
        "event_id", "user_id", "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long").alias("cents"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        (F.coalesce(F.lag("cents", k).over(w), F.lit(0))
         * F.lit(1 << (_EWMA_K - 1 - k)) for k in range(_EWMA_K)),
        start=F.lit(0))
    den = sum(
        (F.when(F.lag("cents", k).over(w).isNotNull(),
                F.lit(1 << (_EWMA_K - 1 - k))).otherwise(F.lit(0))
         for k in range(_EWMA_K)),
        start=F.lit(0))
    return e.select(
        "event_id", "user_id",
        (F.floor((num.cast("double") / den / 100.0) * 10000
                 + F.lit(0.5)) / 10000).alias("ewma"))


# ------------------------------------------ exact bitmap distinct rollup
@query("q_bitmap_rollup", oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT date_trunc('day', ts)) AS n_days
FROM events GROUP BY event_type
""")
def q_bitmap_rollup(spark, sf):
    """EXACT mergeable distinct rollup — the deterministic twin of
    q_hll_rollup for when the rollup must be exact (billing, legal
    retention counts): per-(event_type, day, bucket) ROARING-style
    bitmaps of the user-id set are built once at the fine grain
    (``bitmap_construct_agg`` over ``bitmap_bit_position``, ids
    bucketed by ``bitmap_bucket_number``), and any coarser grain —
    here per event_type across all days — OR-merges the stored
    bitmaps (``bitmap_or_agg``) and pops counts, never rescanning
    raw events. Unlike HLL (~2% error) the OR-merge is exact; unlike
    COUNT(DISTINCT) the daily state is mergeable and incrementally
    maintainable — late data rebuilds one (day, bucket) bitmap.

    Scale: bitmap state is |buckets touched| × 4 KB per group-day —
    dense-id friendly (the 100 TB caveat: sparse 64-bit id spaces
    need a dictionary pass first, q_hll_rollup needs nothing); both
    levels are ordinary partial+final hash aggregates, and the oracle
    (plain COUNT DISTINCT) proves the whole bitmap pipeline exact."""
    ev = load_tables(spark, sf)["events"]
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"))
        .groupBy("event_type", "day", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    users = (
        daily.groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
    )
    # distinct days from the same fine-grain frame (|types×days×bkts|
    # rows), joined back — NOT per-bucket max, which is only exact
    # while a single bucket covers the id space
    days = daily.groupBy("event_type").agg(
        F.countDistinct("day").alias("n_days"))
    return users.join(F.broadcast(days), "event_type")


@query("q_incr_join_refresh", oracle="""
WITH j AS (SELECT o.o_orderstatus, c.c_mktsegment,
                  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                      AS cents
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey)
SELECT o_orderstatus, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM j GROUP BY o_orderstatus, c_mktsegment
""")
def q_incr_join_refresh(spark, sf):
    """Incremental JOIN-view maintenance — the delta-join identity
    every materialized join view at 100 TB lives by, completing the
    incremental lane (q_incr_agg maintains an AGGREGATE under
    appends; this maintains a JOIN): with deterministic delta slices
    Δo (o_orderkey ≡ 0 mod 13) and Δc (c_custkey ≡ 0 mod 17), the
    refreshed view is EXACTLY

        base_o ⋈ base_c  ∪  Δo ⋈ c_full  ∪  base_o ⋈ Δc

    (the standard ΔJ expansion — the Δo⋈Δc corner lives inside the
    Δo⋈c_full term). The Spark side computes the three lanes, each
    REDUCED to its partial (status, segment) aggregate, and
    sum-merges them — the real refresh shape, where the base lane is
    the standing MV you read, not recompute, and only the delta
    lanes do new join work. The oracle is the full recompute over
    the updated tables, so the driver hash proves the incremental
    identity, not just plausibility.

    Scale: the delta lanes join BROADCAST deltas (a day's arrivals
    vs the corpus — plan-pinned); the merge is |groups| rows. At
    100 TB the base lane is a stored table: total refresh work is
    O(Δ) + |groups|, never a second full join."""
    o, c = _ijr_parts(spark, sf)
    base_o = o.filter(F.col("o_orderkey") % 13 != 0)
    dlt_o = o.filter(F.col("o_orderkey") % 13 == 0)
    base_c = c.filter(F.col("c_custkey") % 17 != 0)
    dlt_c = c.filter(F.col("c_custkey") % 17 == 0)

    # standing MV (recomputed here only because the fixture has no
    # stored state; production reads it) + the two O(Δ) lanes, each
    # broadcasting its DELTA side
    mv = _ijr_lane(base_o, base_c)
    d1 = _ijr_lane(dlt_o, c, bcast="left")      # Δo against full c
    d2 = _ijr_lane(base_o, dlt_c, bcast="right")  # base against Δc
    return _ijr_merge(mv, d1, d2)


def _ijr_parts(spark, sf):
    """Projected orders/customer frames shared by q_incr_join_refresh
    and its streaming twin (reports.py) — one price-to-cents rule,
    one column set, so the lanes cannot desync."""
    t = load_tables(spark, sf)
    o = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
         .cast("long").alias("cents"))
    c = t["customer"].select("c_custkey", "c_mktsegment")
    return o, c


def _ijr_lane(orders, custs, bcast=None):
    """One refresh lane: join + partial (status, segment) aggregate;
    bcast names the DELTA side to broadcast."""
    left = F.broadcast(orders) if bcast == "left" else orders
    right = F.broadcast(custs) if bcast == "right" else custs
    j = left.join(right, orders.o_custkey == custs.c_custkey)
    return j.groupBy("o_orderstatus", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"))


def _ijr_merge(*lanes):
    """Sum-merge of partial lane aggregates — the refresh's only
    non-delta work (|groups| rows)."""
    out = lanes[0]
    for x in lanes[1:]:
        out = out.unionByName(x)
    return (out.groupBy("o_orderstatus", "c_mktsegment")
            .agg(F.sum("n_orders").cast("long").alias("n_orders"),
                 F.sum("total_cents").cast("long")
                 .alias("total_cents")))


#: Rolling-median window length (rows), q_ts_rolling_median.
_RMED_W = 24


@query("q_ts_rolling_median", oracle=f"""
SELECT event_id, user_id,
       CAST(2 * median(cents)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {_RMED_W - 1} PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS med_x2_cents
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)
""")
def q_ts_rolling_median(spark, sf):
    """Exact ROLLING MEDIAN per user series (last {_RMED_W} rows) —
    the robust companion of q_ts_ewma's mean smoothing: one outlier
    tick shifts an EWMA for 16 rows but cannot move the median, so
    this is the smoother an anomaly gate reads (q_anomaly_iqr's
    robustness argument applied along time). Values are
    cent-quantized BIGINTs and the published statistic is 2x the
    median — an even window's median averages the two middle
    integers, so doubling keeps the whole lane in exact integers
    (the q_spearman_corr midrank x2 trick): Spark's exact
    windowed percentile(cents, 0.5) and DuckDB's windowed median
    agree on integer inputs by definition (both average the two
    middle order statistics), and the 2x cast is exact in either
    engine. No libm anywhere.

    Scale: ONE hash exchange on user_id, then per-partition sorted
    windows with a bounded {_RMED_W}-row frame — the q_ts_ewma
    shape; rolling-median state is O(window) per row, corpus-size
    independent."""
    e = load_tables(spark, sf)["events"].select(
        "event_id", "user_id", "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
         .alias("cents"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(_RMED_W - 1), W.currentRow))
    return e.select(
        "event_id", "user_id",
        (F.lit(2) * F.expr("percentile(cents, 0.5)").over(w))
        .cast("long").alias("med_x2_cents"))


# ---------------------------------------- supervised lag-feature frame
@query("q_ts_lag_features", oracle="""
WITH v AS (
  SELECT user_id, event_id, ts, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
         row_number() OVER w AS rn,
         lag(value, 1) OVER w AS lag1,
         lag(value, 2) OVER w AS lag2,
         lag(value, 3) OVER w AS lag3,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
             AS BIGINT) AS sum4c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id, value AS target,
       lag1, lag2, lag3,
       CAST(sum4c AS DOUBLE) / 400.0 AS mean4,
       CAST(rn - 1 AS BIGINT) AS n_prev
FROM v WHERE rn > 4
""")
def q_ts_lag_features(spark, sf):
    """Supervised LAG-FEATURE frame — the feature matrix a
    forecasting / uplift trainer consumes, built leakage-safe by
    construction: per user-series (ordered by ts, event_id) each row
    becomes one training example whose features are the previous
    three raw values, the previous-4 rolling mean, and the history
    length, and whose target is the CURRENT value — every feature
    frame ends at row −1, so no expression can see the label. Rows
    with fewer than 4 priors are dropped (incomplete feature vector
    — a trainer imputing cold-start rows does it downstream,
    explicitly).

    Determinism: the lag features are BIT-COPIED doubles (no
    arithmetic, hash-exact); the rolling mean sums CENT-QUANTIZED
    BIGINTs in the frame (exact integers — a sliding double sum
    would depend on each engine's subtract-vs-rescan strategy) and
    divides by the literal 400 once. Scale: ONE hash exchange on
    user_id serves every window expression (they share the
    partition+order), frames are bounded at 4 rows — the plan is a
    single Window operator over a single sort at any corpus size."""
    e = load_tables(spark, sf)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    v = e.select(
        "user_id", "event_id", "value",
        F.row_number().over(w).alias("rn"),
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        F.lag("value", 3).over(w).alias("lag3"),
        F.sum(vc).over(w.rowsBetween(-4, -1)).alias("sum4c"))
    return (v.filter(F.col("rn") > 4)
            .select("user_id", "event_id",
                    F.col("value").alias("target"),
                    "lag1", "lag2", "lag3",
                    (F.col("sum4c").cast("double") / 400.0)
                    .alias("mean4"),
                    (F.col("rn") - 1).cast("long").alias("n_prev")))



# ------------------------------------------- two-window changepoint
#: Contrast half-width (rows on each side). 50 keeps ~19 admissible
#: positions per type-series even at sf0.001 (~2000 rows / 5 types /
#: ... -> ~400 rows per type).
_CHG_W = 50


@query("q_ts_changepoint", oracle=f"""
WITH v AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
         row_number() OVER w AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN {_CHG_W} PRECEDING AND 1 PRECEDING)
             AS BIGINT) AS s_prev,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 1 FOLLOWING AND {_CHG_W} FOLLOWING)
             AS BIGINT) AS s_next
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
c AS (
  SELECT event_type, event_id, ts,
         abs(s_next - s_prev) AS diff_c
  FROM v WHERE rn > {_CHG_W} AND rn + {_CHG_W} <= m),
r AS (
  SELECT event_type, event_id, ts, diff_c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY diff_c DESC, ts, event_id) AS rk
  FROM c)
SELECT event_type, event_id,
       CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
       (CAST(diff_c AS DOUBLE) / {100 * _CHG_W}) AS mean_shift
FROM r WHERE rk = 1
""")
def q_ts_changepoint(spark, sf):
    """CHANGEPOINT detection per metric series — where did the mean
    shift? The two-window contrast detector (the windowed form of
    CUSUM that IS expressible as a plan — CUSUM's recursive fold is
    not): at every admissible position the trailing-{_CHG_W} and
    leading-{_CHG_W} sums are compared, and the position with the
    largest |mean shift| is published per event type with its
    timestamp and the shift magnitude. Edge positions with an
    incomplete window on either side are inadmissible (a half-window
    contrast is biased toward the edges, the classic rookie
    changepoint artifact).

    Determinism: sums are cent-quantized BIGINTs in bounded frames —
    the contrast is EXACT integer arithmetic, argmax tie-broken by
    (ts, event_id); the only double is the published mean shift,
    one exact-integer division by a literal. Scale: ONE hash
    exchange on event_type serves both frame sums, the rank, and
    the admissibility count (all windows share the partitioning);
    output is |types| rows."""
    e = load_tables(spark, sf)["events"]
    wp = W.partitionBy("event_type")
    w = wp.orderBy("ts", "event_id")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    v = e.select(
        "event_type", "event_id", "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("m"),
        F.sum(vc).over(w.rowsBetween(-_CHG_W, -1)).alias("s_prev"),
        F.sum(vc).over(w.rowsBetween(1, _CHG_W)).alias("s_next"))
    c = (v.filter((F.col("rn") > _CHG_W)
                  & (F.col("rn") + _CHG_W <= F.col("m")))
         .select("event_type", "event_id", "ts",
                 F.abs(F.col("s_next") - F.col("s_prev"))
                 .alias("diff_c")))
    rk = F.row_number().over(
        W.partitionBy("event_type")
        .orderBy(F.col("diff_c").desc(), "ts", "event_id"))
    return (c.withColumn("rk", rk).filter(F.col("rk") == 1)
            # publish the position as epoch micros: TIMESTAMP is not
            # in the driver hash's primitive set (the ws_us convention)
            .select("event_type", "event_id",
                    F.unix_micros("ts").alias("ts_us"),
                    (F.col("diff_c").cast("double")
                     / F.lit(float(100 * _CHG_W))).alias("mean_shift")))
