"""Streaming-shaped operators over the events table (SURVEY.md §2.2
rows 45-48), as oracle-checkable batch queries. The same aggregations
run under Structured Streaming with watermarks in
engine/streaming.py (asserted equal to these in tests).

All timestamps compare as epoch microseconds: Spark's events.ts is
ns-truncated-to-µs (engine.io), the oracle uses epoch_ns(ts)//1000 —
identical integers by construction.
"""
from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..io import load_tables
from ..registry import query
from .util import dsum, hexpoly_col, hexpoly_sql, sql_dsum, sql_rnd, rnd

_US_H = 3_600_000_000  # one hour in microseconds


@query("q_window_tumbling", oracle=f"""
WITH e AS (SELECT (epoch_ns(ts) // 1000 // {_US_H}) * {_US_H} AS ws_us,
                  event_type, value
           FROM events)
SELECT ws_us, event_type, count(*) AS n, {sql_dsum('value')} AS sum_value
FROM e GROUP BY ws_us, event_type
""")
def q_window_tumbling(spark, sf):
    ev = load_tables(spark, sf)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.unix_micros("w.start").alias("ws_us"), "event_type", "n", "sum_value")
    )


@query("q_window_sliding", oracle=f"""
WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, value FROM events),
     x AS (SELECT (us // {_US_H // 2}) * {_US_H // 2} - o.off AS ws_us, value
           FROM e CROSS JOIN (VALUES (0::BIGINT), ({_US_H // 2}::BIGINT)) AS o(off))
SELECT ws_us, count(*) AS n, {sql_dsum('value')} AS sum_value
FROM x GROUP BY ws_us
""")
def q_window_sliding(spark, sf):
    # 1-hour windows sliding every 30 min: each event lands in exactly
    # two windows; Spark expands this with its Expand node — the oracle
    # enumerates the same two starts arithmetically.
    ev = load_tables(spark, sf)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.unix_micros("w.start").alias("ws_us"), "n", "sum_value")
    )


@query("q_window_session", oracle=f"""
WITH e AS (SELECT user_id, value, epoch_ns(ts) // 1000 AS us FROM events),
     g AS (SELECT *,
                  CASE WHEN us - lag(us) OVER w > 1800000000
                         OR lag(us) OVER w IS NULL
                       THEN 1 ELSE 0 END AS is_new
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
     s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM g)
SELECT user_id,
       min(us) AS session_start_us,
       max(us) + 1800000000 AS session_end_us,
       count(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM s GROUP BY user_id, sid
""")
def q_window_session(spark, sf):
    # session_window end = last event + gap; the oracle reproduces the
    # same boundary with gaps-and-islands SQL.
    ev = load_tables(spark, sf)["events"]
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events", "sum_value",
        )
    )


@query("q_event_dedup_first", oracle=f"""
WITH e AS (SELECT *, epoch_ns(ts) // 1000 AS us FROM events),
     r AS (SELECT user_id, event_type, event_id, value,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY us, event_id) AS rn
           FROM e)
SELECT user_id, event_type, event_id, {sql_rnd('value')} AS value
FROM r WHERE rn = 1
""")
def q_event_dedup_first(spark, sf):
    # deterministic dedup: explicit (ts, event_id) order — never bare
    # dropDuplicates, whose row choice is partitioning-dependent.
    ev = load_tables(spark, sf)["events"]
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", rnd("value").alias("value"))
    )


@query("q_scd2_history", oracle="""
WITH e AS (SELECT user_id, event_type, event_id,
                  epoch_ns(ts) // 1000 AS us
           FROM events)
SELECT user_id, event_type, event_id,
       us AS valid_from_us,
       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS valid_to_us,
       CASE WHEN lead(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) IS NULL
            THEN true ELSE false END AS is_current
FROM e
""")
def q_scd2_history(spark, sf):
    """Slowly-changing-dimension type 2 build: each user's event
    stream becomes a validity-interval history — every row carries
    [valid_from, valid_to) with the successor's timestamp as its end,
    the latest row left open (``valid_to IS NULL``) and flagged
    current. This is the canonical warehouse history table a pipeline
    derives from a change stream before point-in-time ("as of") joins
    (q_join_asof consumes exactly this shape).

    Plan shape: ONE shuffle on user_id, then a single sorted window
    pass per partition — at 100 TB the shuffle is hash-balanced on
    users, no global sort exists, and (ts, event_id) ordering makes
    the intervals deterministic under any partitioning."""
    ev = load_tables(spark, sf)["events"]
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy(us, "event_id")
    nxt = F.lead(us).over(w)
    return ev.select(
        "user_id", "event_type", "event_id",
        us.alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@query("q_event_transitions", oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id
           ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""")
def q_event_transitions(spark, sf):
    """First-order Markov transition counts over per-user event
    streams (the product-analytics "path analysis" shape): lag the
    event type within each user's time-ordered stream, then count
    (prev -> next) pairs.

    Scale: ONE shuffle partitions by user_id (per-user streams are
    bounded; a pathological power user is still one partition's
    sort), and the transition matrix is |event_types|^2 rows —
    constant-size output regardless of corpus. The follow-up
    aggregate's map side combines into that constant frame before
    the second (tiny) exchange. Tie order within a timestamp is
    fixed by event_id so the lag is deterministic cross-engine."""
    ev = load_tables(spark, sf)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        s.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SPAN_US = 300_000_000  # each event covers [ts, ts + 5 minutes)


@query("q_interval_union", oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS s,
         epoch_ns(ts) // 1000 + {_SPAN_US} AS f
  FROM events),
m AS (
  SELECT user_id, s, f,
         max(f) OVER (PARTITION BY user_id ORDER BY s, f
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM e),
g AS (
  SELECT user_id, s, f,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, f
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM m)
SELECT user_id,
       count(DISTINCT island) AS n_islands,
       CAST(sum(cov) AS BIGINT) AS covered_us
FROM (
  SELECT user_id, island, max(f) - min(s) AS cov
  FROM g GROUP BY user_id, island)
GROUP BY user_id
""")
def q_interval_union(spark, sf):
    """Interval-union coverage (gaps-and-islands): each event covers
    a 5-minute span; overlapping spans per user merge into islands,
    and the operator reports islands and total covered time — the
    'active minutes' / SLA-coverage shape that naive sum-of-spans
    double-counts.

    Scale: ONE shuffle partitions by user_id; both window passes
    (running max-end to detect gaps, running sum to number islands)
    and the island rollup reuse that partitioning — Catalyst plans a
    single Exchange for all three. Output is user-sized. Ties are
    ordered (s, f) so the running max is deterministic."""
    ev = load_tables(spark, sf)["events"]
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_SPAN_US)).alias("f"),
    )
    w = W.partitionBy("user_id").orderBy("s", "f")
    m = e.withColumn(
        "prev_max", F.max("f").over(w.rowsBetween(W.unboundedPreceding, -1)))
    g = m.withColumn(
        "island",
        F.sum(F.when(F.col("prev_max").isNull()
                     | (F.col("s") > F.col("prev_max")), 1)
              .otherwise(0)).over(w.rowsBetween(W.unboundedPreceding, 0)))
    isl = (
        g.groupBy("user_id", "island")
        .agg((F.max("f") - F.min("s")).alias("cov"))
    )
    return (
        isl.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_islands"),
             F.sum("cov").alias("covered_us"))
    )


_SESS_GAP_US = 28_800_000_000   # 8-hour inactivity ends a session
_SESS_CAP_US = 86_400_000_000   # hard 24-hour session-duration cap

#: shared by q_session_capped and its arbitrary-stateful streaming
#: twin q_stream_session_capped (streaming_q.py) — one oracle string
#: so the twins cannot diverge (the AB_CUPED_ORACLE discipline)
SESSION_CAPPED_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_ns(ts) // 1000, event_id)
             AS rn
  FROM events),
walk AS (
  SELECT user_id, rn, us, us AS sess_start, 1 AS sess_idx
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.us,
         CASE WHEN s.us - w.us > {_SESS_GAP_US}
                OR s.us - w.sess_start > {_SESS_CAP_US}
              THEN s.us ELSE w.sess_start END,
         CASE WHEN s.us - w.us > {_SESS_GAP_US}
                OR s.us - w.sess_start > {_SESS_CAP_US}
              THEN w.sess_idx + 1 ELSE w.sess_idx END
  FROM seq s JOIN walk w
    ON s.user_id = w.user_id AND s.rn = w.rn + 1)
SELECT user_id, sess_idx, count(*) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us
FROM walk GROUP BY user_id, sess_idx
"""


@query("q_session_capped", oracle=SESSION_CAPPED_ORACLE)
def q_session_capped(spark, sf):
    """Capped sessionization: a session ends after 8 h of inactivity
    OR when it would exceed a hard 24 h duration cap — the bot-guard
    rule every production sessionizer carries and the one shape
    ``session_window`` CANNOT express (whether an event extends a
    session depends on the session's START, which is itself a result
    of earlier decisions — inherently sequential per user).

    This is the canonical custom-stateful case: the stream is
    hash-distributed by user and time-sorted WITHIN each partition
    (``repartition`` + ``sortWithinPartitions``), and one
    ``mapInPandas`` pass runs the linear scan — state (current
    user's session start / previous timestamp) carries across Arrow
    batches of the partition, resetting at user boundaries. A
    per-group ``applyInPandas`` computes the same thing but pays
    per-group invocation overhead (measured 8.3 s vs 1.5 s at sf0.1
    with 15k users); the partition-sorted scan is how a production
    sessionizer actually runs. Scale: ONE shuffle on user_id; the
    scan is O(rows) per partition; a power user is one partition's
    loop. The oracle replays the identical recursion as a WITH
    RECURSIVE walk over per-user row numbers — exact same session
    assignment, depth = max events per user."""
    import numpy as np
    import pandas as pd

    ev = load_tables(spark, sf)["events"]
    src = (
        ev.select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "us", "event_id")
    )

    def sessionize(batches):
        cur = None          # current user id
        sess = 0            # session index within current user
        start = prev = None  # session start / previous event time
        n = 0               # events in current session
        smin = smax = None

        out_user, out_idx, out_n, out_s, out_e = [], [], [], [], []

        def flush():
            if cur is not None and n > 0:
                out_user.append(cur)
                out_idx.append(sess)
                out_n.append(n)
                out_s.append(smin)
                out_e.append(smax)

        for pdf in batches:
            users = pdf["user_id"].to_numpy()
            times = pdf["us"].to_numpy()
            for u, t in zip(users, times):
                if u != cur:
                    flush()
                    cur, sess, start, prev = u, 1, t, t
                    n, smin, smax = 1, t, t
                elif (t - prev > _SESS_GAP_US
                        or t - start > _SESS_CAP_US):
                    flush()
                    sess += 1
                    start = t
                    n, smin, smax = 1, t, t
                else:
                    n += 1
                    smax = t
                prev = t
            if out_user:
                yield pd.DataFrame({
                    "user_id": np.array(out_user, dtype=np.int64),
                    "sess_idx": np.array(out_idx, dtype=np.int32),
                    "n_events": np.array(out_n, dtype=np.int64),
                    "start_us": np.array(out_s, dtype=np.int64),
                    "end_us": np.array(out_e, dtype=np.int64),
                })
                out_user, out_idx, out_n, out_s, out_e = \
                    [], [], [], [], []
        flush()
        if out_user:
            yield pd.DataFrame({
                "user_id": np.array(out_user, dtype=np.int64),
                "sess_idx": np.array(out_idx, dtype=np.int32),
                "n_events": np.array(out_n, dtype=np.int64),
                "start_us": np.array(out_s, dtype=np.int64),
                "end_us": np.array(out_e, dtype=np.int64),
            })

    return src.mapInPandas(
        sessionize,
        "user_id long, sess_idx int, n_events long, "
        "start_us long, end_us long")


# Synthesized I/U/D change log, shared by the batch apply
# (q_cdc_apply) and the streaming compaction oracle
# (q_stream_cdc_compact): op from a content hash, key folded into
# 1.5x the customer key space so every branch is exercised.
CDC_LOG_SQL = f"""params AS (SELECT count(*) AS nc FROM customer),
log AS (
  SELECT (user_id * 13) % (nc + nc // 2) AS k,
         epoch_ns(ts) // 1000 AS us, event_id, value,
         CASE WHEN {hexpoly_sql("md5(concat(event_id, '#cdc'))")} % 10 < 2
                THEN 'D'
              WHEN {hexpoly_sql("md5(concat(event_id, '#cdc'))")} % 10 < 5
                THEN 'I'
              ELSE 'U' END AS op
  FROM events, params)"""


@query("q_cdc_apply", oracle=f"""
WITH {CDC_LOG_SQL},
last AS (
  SELECT k, op, value, n_ops FROM (
    SELECT k, op, value,
           row_number() OVER (PARTITION BY k
                              ORDER BY us DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY k) AS n_ops
    FROM log) WHERE rn = 1)
SELECT b.c_custkey, l.k IS NOT NULL AS from_log,
       CASE WHEN l.k IS NULL THEN b.c_acctbal ELSE l.value END AS bal,
       CASE WHEN l.k IS NULL THEN 'kept' ELSE 'updated' END AS action,
       coalesce(l.n_ops, 0) AS n_ops
FROM customer b LEFT JOIN last l ON b.c_custkey = l.k
WHERE l.k IS NULL OR l.op <> 'D'
UNION ALL
SELECT l.k, TRUE, l.value, 'inserted', l.n_ops
FROM last l
WHERE l.op <> 'D'
  AND NOT EXISTS (SELECT 1 FROM customer b WHERE b.c_custkey = l.k)
""")
def q_cdc_apply(spark, sf):
    """CDC change-log application (the Debezium/materialize shape): an
    ordered insert/update/delete log is compacted to its LAST
    operation per key, then merged into a base snapshot — deletes
    drop rows, updates/inserts carry the log's value, untouched rows
    survive. The log here is synthesized deterministically from the
    events table (op from a content hash, key folded into 1.5x the
    customer key space so every branch — kept / updated / deleted /
    inserted — is exercised) so the DuckDB oracle replays it exactly.

    Scale: compaction is ONE groupBy(key) with a struct-max (partial
    aggregate, no window sort) — the log shuffles only (key, 30-byte
    struct). The snapshot join is left to AQE: in the normal CDC
    regime the compacted log is change-batch-sized (bounded by ingest
    rate, independent of base size) and AQE broadcasts it, so the
    100 TB base never shuffles — same discipline as q_upsert_merge /
    q_merge_idempotent; for a backfill-scale log whose compacted key
    set approaches the base's (as this synthetic fixture's does by
    construction — its key space is 1.5x the snapshot to exercise
    every branch), AQE degrades gracefully to a key-shuffled join
    instead of an oversized broadcast."""
    from ..io import table_count

    t = load_tables(spark, sf)
    ev, c = t["events"], t["customer"]
    nc = table_count(spark, sf, "customer")
    span = nc + nc // 2
    opn = hexpoly_col(F.md5(F.concat(
        F.col("event_id").cast("string"), F.lit("#cdc")))) % 10
    log = ev.select(
        ((F.col("user_id") * 13) % span).alias("k"),
        F.unix_micros("ts").alias("us"), "event_id", "value",
        F.when(opn < 2, "D").when(opn < 5, "I").otherwise("U").alias("op"),
    )
    last = (
        log.groupBy("k")
        .agg(F.max(F.struct("us", "event_id", "op", "value")).alias("m"),
             F.count(F.lit(1)).alias("n_ops"))
        .select("k", F.col("m.op").alias("op"),
                F.col("m.value").alias("value"), "n_ops")
    )
    applied = (
        c.join(last, c.c_custkey == last.k, "left")
        .filter(F.col("k").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            F.col("k").isNotNull().alias("from_log"),
            F.when(F.col("k").isNull(), F.col("c_acctbal"))
             .otherwise(F.col("value")).alias("bal"),
            F.when(F.col("k").isNull(), "kept")
             .otherwise("updated").alias("action"),
            F.coalesce("n_ops", F.lit(0).cast("long")).alias("n_ops"),
        )
    )
    inserted = (
        last.filter(F.col("op") != "D")
        .join(c, last.k == c.c_custkey, "left_anti")
        .select(F.col("k").alias("c_custkey"),
                F.lit(True).alias("from_log"),
                F.col("value").alias("bal"),
                F.lit("inserted").alias("action"), "n_ops")
    )
    return applied.unionAll(inserted)


@query("q_attribution", oracle="""
WITH tagged AS (
  SELECT user_id, event_id, event_type, value, ts,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS touch_id,
         first_value(CASE WHEN event_type IN ('view', 'click')
                          THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS first_touch_id
  FROM events)
SELECT user_id, event_id AS purchase_id, touch_id AS last_touch_id,
       first_touch_id,
       floor(value * 10000 + 0.5) / 10000 AS value
FROM tagged
WHERE event_type = 'purchase' AND touch_id IS NOT NULL
""")
def q_attribution(spark, sf):
    """First-/last-touch marketing attribution: every purchase is
    credited to the user's most recent and very first preceding
    touch event (view/click), the canonical funnel-credit shape of
    growth analytics.

    One window over (user, time) does both lookups — last_value and
    first_value with IGNORE NULLS over the preceding frame — so the
    plan is a single sort within user partitions, no self-join (the
    naive formulation joins purchases against touches and re-ranks:
    two shuffles and a skew hazard on busy users). Ties on ts break
    by event_id in BOTH engines, making the credited touch
    deterministic. At 100 TB: one shuffle on user_id; AQE splits
    skewed users; the frame is running state, not a buffered
    window."""
    from pyspark.sql import Window as W

    e = load_tables(spark, sf)["events"]
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_id"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    tagged = e.select(
        "user_id", "event_id", "event_type", "value", "ts",
        F.last(touch, ignorenulls=True).over(w).alias("touch_id"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch_id"),
    )
    return (
        tagged.filter((F.col("event_type") == "purchase")
                      & F.col("touch_id").isNotNull())
        .select(
            "user_id", F.col("event_id").alias("purchase_id"),
            F.col("touch_id").alias("last_touch_id"), "first_touch_id",
            rnd(F.col("value"), 4).alias("value"))
    )


# -------------------------------------------------- conversion latency
@query("q_conversion_lag", oracle="""
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
  FROM events GROUP BY 1),
c AS (
  SELECT CAST(epoch_us(first_buy) - epoch_us(first_view) AS BIGINT)
             AS lag_us
  FROM u
  WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
    AND first_buy >= first_view)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(lag_us, 0.25) AS BIGINT) AS p25_us,
       CAST(quantile_disc(lag_us, 0.5) AS BIGINT) AS p50_us,
       CAST(quantile_disc(lag_us, 0.75) AS BIGINT) AS p75_us
FROM c
""")
def q_conversion_lag(spark, sf):
    """Time-to-convert distribution: per user, the latency from first
    'view' to first 'purchase' (converters only), summarized as
    discrete quartiles of exact microsecond lags — the funnel-latency
    readout next to q_events_funnel's conversion counts.

    Scale: ONE conditional-min groupBy(user) collapses the event
    stream to a row per user before anything else; the quartile
    aggregate then runs over |converters| rows (users, not events).
    Discrete percentiles over exact integers are engine-independent
    — no interpolation, no float ties.  The final single-group
    percentile gathers converter lags into one aggregation buffer;
    at extreme user counts the grouped discrete-percentile fit
    (q_quantile_bins' distributed exact path) is the documented
    swap."""
    e = load_tables(spark, sf)["events"]
    u = (e.groupBy("user_id")
         .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
              .alias("first_view"),
              F.min(F.when(F.col("event_type") == "purchase",
                           F.col("ts"))).alias("first_buy")))
    c = (u.filter(F.col("first_view").isNotNull()
                  & F.col("first_buy").isNotNull()
                  & (F.col("first_buy") >= F.col("first_view")))
         .select((F.unix_micros("first_buy")
                  - F.unix_micros("first_view")).alias("lag_us")))
    return c.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY lag_us)")
        .cast("long").alias("p25_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us)")
        .cast("long").alias("p50_us"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY lag_us)")
        .cast("long").alias("p75_us"))


# ------------------------------------------------------ user growth
@query("q_user_growth", oracle="""
WITH f AS (
  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY 1),
a AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM events GROUP BY 1),
nw AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
  FROM f GROUP BY 1)
SELECT CAST(a.day AS VARCHAR) AS day, a.n_active,
       CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new,
       CAST(a.n_active - coalesce(nw.n_new, 0) AS BIGINT)
           AS n_returning,
       CAST(sum(coalesce(nw.n_new, 0)) OVER (ORDER BY a.day)
            AS BIGINT) AS n_cum_users
FROM a LEFT JOIN nw USING (day)
""")
def q_user_growth(spark, sf):
    """Daily active / new / returning users plus the cumulative
    distinct-user curve — the growth-accounting decomposition every
    product dashboard leads with.  The cumulative count uses the
    first-seen trick: each user contributes once at min(day), so the
    running total over per-day new-user counts IS the exact
    cumulative distinct — no distinct-inside-window, no
    re-aggregation of history.

    Scale: two data-sized map-side-combined aggregates (first-seen
    per user, active per day), then day-grain joins and one ordered
    window over the |days| frame (cardinality-sized, the
    q_weighted_quantile discipline)."""
    e = load_tables(spark, sf)["events"]
    day = F.date_trunc("day", "ts").cast("date")
    f = (e.groupBy("user_id")
         .agg(F.min(day).alias("first_day")))
    a = (e.groupBy(day.alias("day"))
         .agg(F.countDistinct("user_id").alias("n_active")))
    nw = (f.groupBy(F.col("first_day").alias("day"))
          .agg(F.count(F.lit(1)).alias("n_new")))
    j = (a.join(nw, "day", "left")
         .select("day", "n_active",
                 F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        # ISO string, not DATE: the driver value-hash convention
        # admits only primitive hash-safe types (q_retention
        # precedent; pinned in test_output_types_hash_safe)
        F.col("day").cast("string").alias("day"),
        "n_active", "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(w).alias("n_cum_users"))



# ------------------------------------- exact sliding-window distinct
@query("q_window_rolling_distinct", oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
mm AS (SELECT min(d) AS mn, max(d) AS mx FROM ud),
cal AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE
            AS w_day
        FROM mm)
SELECT strftime(w_day, '%Y-%m-%d') AS w_day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
FROM cal JOIN ud ON ud.d BETWEEN w_day - 6 AND w_day
GROUP BY 1
""")
def q_window_rolling_distinct(spark, sf):
    """EXACT sliding-window distinct count — trailing-7-day active
    users per day, the metric every growth dashboard wants and every
    engine struggles with, because COUNT(DISTINCT) OVER a sliding
    frame is unsupported (Spark) or a full re-scan per window
    (naive SQL), and the usual escape is an approximate HLL union.
    This is the EXACT scale path: a user contributes +1 to window
    w iff their FIRST active day inside [w-6, w] exists, and that
    first-day condition is local to one lag — an active day d whose
    previous active day is p covers exactly the window-ends
    [max(d, p+7), d+6]. Emitting that span (≤7 rows per active day)
    and counting per window-end reproduces the distinct count with
    NO distinct aggregation over windows at all.

    The oracle is the honest brute force (calendar × activity range
    join + COUNT(DISTINCT)) — |days| windows make it cheap to
    verify, and the hash proves the emission identity. Scale: one
    (user, day) dedupe + one user-keyed lag window + a ≤7× bounded
    explode + one |days|-row count — the corpus is never joined
    against the calendar, and state never exceeds the activity
    grain. Partial windows at the range start are reported as-is
    (the ramp a dashboard annotates, not hides)."""
    e = load_tables(spark, sf)["events"]
    ud = (e.select("user_id", F.to_date("ts").alias("d"))
          .distinct())
    mx = ud.agg(F.max("d").alias("mx"))
    w = W.partitionBy("user_id").orderBy("d")
    # materialize the lag before the explode: a window expression
    # cannot sit inside a generator's argument in one projection
    spans = (ud.crossJoin(F.broadcast(mx))
             .select("d", "mx", F.lag("d").over(w).alias("p"))
             .select(
                 F.greatest(F.col("d"),
                            F.coalesce(F.date_add(F.col("p"), 7),
                                       F.col("d"))).alias("lo"),
                 F.least(F.date_add(F.col("d"), 6),
                         F.col("mx")).alias("hi")))
    return (spans
            # an empty span (re-activation within 7 days at the range
            # end: lo > hi) must emit NOTHING — Spark's sequence()
            # would otherwise generate it DESCENDING
            .filter(F.col("lo") <= F.col("hi"))
            .select(F.explode(F.sequence("lo", "hi")).alias("wd"))
            # publish the day as a string: DATE is not in the driver
            # hash's primitive set (the strftime/odate convention)
            .groupBy(F.date_format("wd", "yyyy-MM-dd").alias("w_day"))
            .agg(F.count(F.lit(1)).alias("n_active")))
