"""Adversarial-magnitude pins for the round-7 decimal(38,0)
accumulator fixes.

Five keys summed integer PRODUCTS (co-moments, rank-weighted sums,
cubic tie terms) into int64; per-row products fit long by design,
but the SUMS cross 2^63 at the 10x/100x probe grains, and this
engine runs ANSI mode where that is a hard ARITHMETIC_OVERFLOW
error, not a silent wrap. Each fix moved the accumulator to
decimal(38,0). These tests run the affected keys against a
synthetic fixture whose magnitudes sit ABOVE the old int64 cliff
(but below the per-row long bound), so reverting any accumulator
to a long sum fails this suite immediately instead of waiting for
the next scale probe.

Magnitudes engineered per key (see inline math):
- q_linreg_group / q_spearman_corr / q_mann_whitney: 4.4M lineitem
  rows, extendedprice 3e6 (Σy² ≈ 4e23) and a SINGLE quantity value
  (per-row tie cube t³ ≈ 8.5e19 crosses long on its own — past the
  2.1M-rows-per-value int64 limit — and Σ midrank² ≈ 8.5e19). The
  all-tied/zero-variance columns also pin EVERY ANSI divide-by-zero
  guard (this config hard-errors even on double/0): linreg slope/r²,
  Spearman ρ, and the Mann-Whitney σ must all go NULL, not crash.
- q_gini: 1.2M orders in one nation, totalprice 5e5
  (Σ rk·xs ≈ 3.6e19).
- q_time_weighted_avg / q_ts_autocorr: 1.5M events on few series,
  value 4e4 over a 50-year span (Σ vs·dt ≈ 6e23; Σx² ≈ 2.4e23).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engine.registry import QUERIES, load_all
from tests.conftest import SF_SMALL

load_all()

_DIR = "/tmp/engine_overflow_fixture_v4"


@pytest.fixture(scope="session")
def overflow_sf(spark):
    if not os.path.exists(os.path.join(_DIR, "_DONE")):
        os.makedirs(_DIR, exist_ok=True)
        (spark.range(4_400_000).select(
            (F.col("id") + 1).alias("l_orderkey"),
            (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
            F.when(F.col("id") % 2 == 0, "A").otherwise("N")
            .alias("l_returnflag"),
            F.lit("F").alias("l_linestatus"),
            F.lit(25.0).alias("l_quantity"),
            F.lit(3_000_000.0).alias("l_extendedprice"),
            ((F.col("id") % 11).cast("double") / 100.0)
            .alias("l_discount"))
         .write.mode("overwrite").parquet(f"{_DIR}/lineitem.parquet"))
        (spark.range(1_200_000).select(
            (F.col("id") + 1).alias("o_orderkey"),
            (F.col("id") % 100 + 1).alias("o_custkey"),
            (F.lit(500_000.0) + (F.col("id") % 997).cast("double"))
            .alias("o_totalprice"),
            F.expr("timestamp_micros(800000000000000 + id)")
            .alias("o_orderdate"))
         .write.mode("overwrite").parquet(f"{_DIR}/orders.parquet"))
        (spark.range(100).select(
            (F.col("id") + 1).alias("c_custkey"),
            F.lit(7).cast("int").alias("c_nationkey"),
            F.lit("BUILDING").alias("c_mktsegment"),
            F.lit(1000.0).alias("c_acctbal"))
         .write.mode("overwrite").parquet(f"{_DIR}/customer.parquet"))
        span_us = 50 * 365 * 24 * 3600 * 1_000_000  # ~50 years
        (spark.range(1_500_000).select(
            F.col("id").alias("event_id"),
            F.expr(f"timestamp_micros(800000000000000 "
                   f"+ id * {span_us // 1_500_000})").alias("ts"),
            (F.col("id") % 3).alias("user_id"),
            F.when(F.col("id") % 2 == 0, "view").otherwise("click")
            .alias("event_type"),
            (F.lit(40_000.0) + (F.col("id") % 13).cast("double"))
            .alias("value"),
            F.lit("{}").alias("props"))
         .write.mode("overwrite").parquet(f"{_DIR}/events.parquet"))
        for t in ("region", "nation", "supplier", "part",
                  "documents", "embeddings"):
            dst = f"{_DIR}/{t}.parquet"
            if not os.path.lexists(dst):
                os.symlink(os.path.abspath(
                    f"{SF_SMALL.rstrip('/')}/{t}.parquet"), dst)
        open(os.path.join(_DIR, "_DONE"), "w").close()
    return _DIR


@pytest.mark.parametrize("key", [
    "q_linreg_group", "q_spearman_corr", "q_mann_whitney",
    "q_gini", "q_time_weighted_avg", "q_ts_autocorr",
])
def test_no_int64_overflow_above_old_cliff(spark, overflow_sf, key):
    rows = QUERIES[key](spark, overflow_sf).collect()
    assert rows  # completed past the old cliff without ANSI overflow
    # the degenerate columns must flow through the nullif guards as
    # NULL — reverting a guard crashes above; a wrong guard that
    # emits Inf/NaN instead fails here
    if key == "q_linreg_group":
        assert all(r.slope is None and r.r2 is None for r in rows)
    if key == "q_spearman_corr":
        assert all(r.rho is None for r in rows)
    if key == "q_mann_whitney":
        assert all(r.z_stat is None for r in rows)
