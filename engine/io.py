"""Table loading, view registration, and sinks.

``load_tables`` reads the ten driver parquet tables, repairs
``events.ts`` (TIMESTAMP(NANOS) → microsecond timestamp, SURVEY.md
§1.4), registers temp views, and memoizes per (session, sf_dir) so
the ~70 query callables don't re-read parquet footers.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all driver tables as DataFrames and register temp views."""
    key = (id(spark), sf_dir.rstrip("/"))
    if key in _CACHE:
        return _CACHE[key]
    configure(spark)
    dfs: dict[str, DataFrame] = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{t}.parquet")
        if t == "events":
            # raw column is bigint nanoseconds (legacy.parquet.nanosAsLong);
            # truncate to microseconds — matches DuckDB epoch_ns(ts)//1000.
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        dfs[t] = df
        df.createOrReplaceTempView(t)
    _CACHE[key] = dfs
    return dfs


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)
