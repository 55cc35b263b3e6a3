"""Explicit skew mitigation: salted joins.

The session enables AQE skew-join splitting (engine/session.py), which
handles most hot-key joins at runtime. Explicit salting remains the
right tool when BOTH join sides are too large to broadcast AND the
skew is known up front — it fixes the layout at plan time instead of
relying on runtime re-splitting, and it composes with bucketing.

Salted aggregation needs no helper: Spark's hash aggregate is already
two-phase (map-side partial before the shuffle), which is exactly the
salt-then-merge trick for algebraic aggregates.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str,
    nsalt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join where hot keys on ``big`` are spread over ``nsalt``
    sub-keys. ``big`` rows get a deterministic salt from
    ``xxhash64(salt_src) % nsalt`` (any column unique-ish per row);
    ``small`` is replicated nsalt times (explode of a literal range —
    an nsalt× blow-up of the SMALL side only). The join then runs on
    (key..., _salt), so a key holding 90% of the big side lands on
    nsalt reducers instead of one. Output drops the salt column.

    Only join types whose result is unchanged by replicating the
    small side are allowed: inner/left keep unmatched SMALL rows out
    of the output, so the nsalt copies collapse; right/full outer
    would emit every unmatched small row nsalt times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: join type {how!r} is not semantics-preserving "
            "under small-side replication (unmatched small rows would "
            "appear nsalt times); use inner/left/semi/anti")
    bigs = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(nsalt)).cast("int"))
    smalls = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1))))
    return bigs.join(smalls, on + ["_salt"], how).drop("_salt")
