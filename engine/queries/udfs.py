"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 rows 63-65).

All Python execution here is Arrow-batched (pandas_udf / UDTF) —
never row-at-a-time Python UDFs. These keys exist to prove the
JVM↔Python bridge; every hot-path operator elsewhere in the engine
stays in built-in JVM expressions.

pandas_udf wrapping happens lazily inside the query callables:
the decorator parses its DDL return type through the active
SparkSession, so module import must stay session-free.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..io import load_tables
from ..registry import query
from .util import sql_rnd

_cache: dict[str, object] = {}


def _trapezoid_udf():
    if "trap" not in _cache:
        @pandas_udf("double")
        def _trapezoid_w(i: pd.Series) -> pd.Series:
            """R1 interior-block trapezoid weight for bs=16, o=2
            (vectorized re-derivation of reference stitch.py:15-38)."""
            ramp = 3.0  # 2*o - 1
            left = (i / ramp).clip(upper=1.0)
            right = ((19 - i) / ramp).clip(upper=1.0)
            return pd.concat([left, right], axis=1).min(axis=1)

        _cache["trap"] = _trapezoid_w
    return _cache["trap"]


def _weighted_mean_udf():
    if "wmean" not in _cache:
        @pandas_udf("double")
        def _weighted_mean(x: pd.Series, w: pd.Series) -> float:  # GROUPED_AGG
            return float((x * w).sum() / w.sum())

        _cache["wmean"] = _weighted_mean
    return _cache["wmean"]


@query("q_udf_scalar", oracle=f"""
SELECT i,
       {sql_rnd('least(1e0, least(i / 3e0, (19 - i) / 3e0))', 6)} AS w
FROM generate_series(0, 19) AS t(i)
""")
def q_udf_scalar(spark, sf):
    trap = _trapezoid_udf()
    return spark.range(20).select(
        F.col("id").alias("i"),
        (F.floor(trap(F.col("id").cast("double")) * 1000000 + F.lit(0.5))
         / 1000000).alias("w"),
    )


@query("q_udaf_weighted_mean", oracle=f"""
SELECT l_returnflag,
       {sql_rnd('sum(l_extendedprice * l_quantity) / sum(l_quantity)')} AS wmean
FROM lineitem GROUP BY l_returnflag
""")
def q_udaf_weighted_mean(spark, sf):
    li = load_tables(spark, sf)["lineitem"]
    wmean = _weighted_mean_udf()
    return li.groupBy("l_returnflag").agg(
        (F.floor(wmean("l_extendedprice", "l_quantity") * 10000
                 + F.lit(0.5)) / 10000).alias("wmean")
    )


def _neighbor_udtf():
    if "nbr" not in _cache:
        @udtf(returnType="dx INT, dy INT, dz INT, "
                         "nbx BIGINT, nby BIGINT, nbz BIGINT")
        class _NeighborOffsets:
            """R6's 27-neighbor stencil enumeration
            (reference local_affine.py:79-81) as a Python UDTF."""

            def eval(self, bx: int, by: int, bz: int,
                     gx: int, gy: int, gz: int):
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        for dz in (-1, 0, 1):
                            nx, ny, nz = bx + dx, by + dy, bz + dz
                            if 0 <= nx < gx and 0 <= ny < gy and 0 <= nz < gz:
                                yield dx, dy, dz, nx, ny, nz

        _cache["nbr"] = _NeighborOffsets
    return _cache["nbr"]


@query("q_udtf_expand", oracle="""
SELECT bx, by, bz, bx + dx AS nbx, by + dy AS nby, bz + dz AS nbz
FROM generate_series(0, 2) AS t1(bx), generate_series(0, 2) AS t2(by),
     generate_series(0, 1) AS t3(bz),
     generate_series(-1, 1) AS o1(dx), generate_series(-1, 1) AS o2(dy),
     generate_series(-1, 1) AS o3(dz)
WHERE bx + dx BETWEEN 0 AND 2
  AND by + dy BETWEEN 0 AND 2
  AND bz + dz BETWEEN 0 AND 1
""")
def q_udtf_expand(spark, sf):
    spark.udtf.register("neighbor_offsets", _neighbor_udtf())
    blocks = (
        spark.range(3).select(F.col("id").alias("bx"))
        .crossJoin(spark.range(3).select(F.col("id").alias("by")))
        .crossJoin(spark.range(2).select(F.col("id").alias("bz")))
    )
    blocks.createOrReplaceTempView("udtf_blocks")
    return spark.sql("""
        SELECT b.bx, b.by, b.bz, n.nbx, n.nby, n.nbz
        FROM udtf_blocks b,
             LATERAL neighbor_offsets(
                 CAST(b.bx AS INT), CAST(b.by AS INT), CAST(b.bz AS INT),
                 3, 3, 2) n
    """)
