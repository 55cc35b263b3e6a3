"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the ``engine`` package (engine/queries/*);
this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

# Keys already driver-verified green in CORRECTNESS_r02.json (47 hash-green +
# 2 rows-only-by-design).  The driver's correctness gate covers the first 50
# keys in dict order per round, so these rotate to the BACK of the dict and
# the 43 keys without a driver row yet — plus the re-fixed q_agg_distinct and
# any newly added keys — fill the front of the window.
_R02_GREEN = [
    "q_scan_project", "q_scan_count_all", "q_source_range",
    "q_sink_roundtrip", "q_filter_pred", "q_project_compute",
    "q_sample_hash", "q_join_inner", "q_join_broadcast", "q_join_left",
    "q_join_full", "q_join_semi", "q_join_anti", "q_join_cross",
    "q_join_theta_range", "q_join_asof", "q_join_interval",
    "q_join_bucketed", "q_agg_pricing_summary", "q_agg_having",
    "q_agg_approx_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_grouping_sets", "q_agg_stats", "q_window_rank",
    "q_window_lag_lead", "q_window_frame_rows", "q_window_frame_range",
    "q_window_analytic", "q_window_running_total", "q_topk_orders",
    "q_limit_offset", "q_union_all", "q_union_distinct", "q_intersect",
    "q_except", "q_pivot", "q_unpivot", "q_subquery_scalar",
    "q_subquery_exists", "q_subquery_in", "q_cte_chain", "q_null_handling",
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_conditional",
    "q_cast_types",
]


# Keys added late in round 3 that DEFER to the front of the queue.
# They sit behind every key still waiting for its first driver row —
# the 44 keys unverified since round 2 PLUS four early-round-3 keys
# deliberately kept in the waiting tier (q_dedup_embed_cosine,
# q_multimodal_frames, and the two *_blocks keys, which the round-2
# verdict explicitly asked to get driver rows) — so the whole original
# SURVEY §2.2 checklist verifies first and the rest rotate into later
# windows.
_R03_NEW = [
    "q_dedup_cluster", "q_dedup_resolve", "q_multimodal_resize",
    "q_dedup_keep_best", "q_sample_stratified", "q_dataset_mix",
    "q_token_histogram", "q_events_funnel", "q_retention",
    "q_ngram_freq", "q_join_salted", "q_percentile_cont",
    "q_source_csv", "q_sink_partitioned", "q_source_json",
    "q_window_ntile", "q_corr_stats", "q_rollup_time",
    "q_agg_approx_quantile", "q_text_clean", "q_stream_tumbling",
    "q_stream_sliding", "q_stream_session", "q_stream_stateful_totals",
    "q_corpus_curate",
]


def _rotated(keys) -> list[str]:
    """Waiting-longest-first key order (relative registration order
    preserved within each tier): round-2-unverified, then round-3
    additions, then already-green keys."""
    green, new = set(_R02_GREEN), set(_R03_NEW)
    waiting = [k for k in keys if k not in green and k not in new]
    fresh = [k for k in keys if k in new]
    back = [k for k in keys if k in green]
    return waiting + fresh + back


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from engine import registry

    registry.load_all()
    return registry.QUERIES["q_agg_pricing_summary"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from engine import registry

    registry.load_all()
    return {k: registry.QUERIES[k] for k in _rotated(registry.QUERIES)}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per key (omitted ⇒ rows-only check)."""
    from engine import registry

    registry.load_all()
    return {k: registry.ORACLE[k] for k in _rotated(registry.ORACLE)}
