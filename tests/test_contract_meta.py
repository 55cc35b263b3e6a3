"""Meta-guards on the driver contract: every registered oracle must
PARSE in DuckDB against the real tables (catches SQL typos and
engine-dialect slips at test time instead of in the driver's
correctness gate), and every auxiliary key list (bench HEADLINE,
rotation cohorts, probe lists) must reference keys that actually
exist in the registry (catches renames silently orphaning a list).
No SparkSession needed — this file runs in milliseconds-to-seconds.
"""
from __future__ import annotations

import duckdb
import pytest

from engine.registry import ORACLE, QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(ORACLE))
def test_oracle_sql_parses_in_duckdb(duck, key):
    # EXPLAIN binds + plans without executing — a syntax error,
    # unknown function, or missing column fails here, in seconds,
    # instead of in the driver's correctness window.
    duck.sql(f"EXPLAIN {ORACLE[key]}")


def test_bench_headline_keys_exist():
    import bench

    missing = [k for k in bench.HEADLINE if k not in QUERIES]
    assert not missing, missing


def test_rotation_cohorts_reference_real_keys():
    # Discover cohorts by naming convention rather than a hand-kept
    # tuple, so a future _R0NX_NEW cohort can't be silently omitted
    # from the staleness check (the r6 _R06C_NEW omission).
    import __spark_entry__ as entry

    cohorts = [getattr(entry, name) for name in dir(entry)
               if name.endswith(("_GREEN", "_NEW"))]
    assert len(cohorts) >= 6, "cohort discovery broke"
    for cohort in cohorts:
        stale = [k for k in cohort if k not in QUERIES]
        assert not stale, stale


def test_scale_probe_keys_exist():
    import scale_probe

    for lst in (scale_probe.DOC_KEYS, scale_probe.REL_KEYS,
                scale_probe.X100_KEYS, scale_probe.REL100_KEYS):
        missing = [k for k in lst if k not in QUERIES]
        assert not missing, missing
