"""Data-layout operators: multi-dimensional (z-order) clustering.

The reference (GFleishman/dask_stitch) inherits dask's block layout;
a 100 TB Spark table instead chooses its OWN file layout, and that
choice is the first scan-pruning lever after partitioning: parquet
keeps per-file (and per-row-group) min/max statistics, so a filter on
a column can skip every file whose [min, max] span misses the
predicate. A single-column sort makes ONE column's spans narrow; a
z-order (Morton) sort interleaves the bits of several columns so that
EVERY interleaved column's spans stay narrow at once — the classic
multi-dimensional clustering trade (each dimension's span grows only
as the square root of file count instead of linearly).

Everything here is built-in integer arithmetic (shiftleft / shiftright
/ & — whole-stage codegen, no UDF), a narrow map plus one range
shuffle; the z-value kernel is oracle-checked cross-engine by
``q_zorder_cells`` (engine/queries/pipeline.py) and the actual
file-span benefit is measured from real parquet footers in
tests/test_layout.py.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits interleaved per dimension (two dims → 2*ZBITS-bit z-value)
ZBITS = 7


def z_expr_sql(ub: str, vb: str, bits: int = ZBITS, duck: bool = False) -> str:
    """The 2-D Morton interleave as engine-portable SQL arithmetic:
    bit i of ``ub`` lands at position 2i, bit i of ``vb`` at 2i+1.
    Both operands must already be integer bucket columns in
    [0, 2^bits). ``duck=True`` spells shifts as infix operators for
    the DuckDB oracle; Spark uses the shiftleft/shiftright builtins
    (same values bit for bit)."""
    if duck:
        terms = [f"((({ub} >> {i}) & 1) << {2 * i})" for i in range(bits)]
        terms += [f"((({vb} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    else:
        terms = [
            f"shiftleft(shiftright({ub}, {i}) & 1, {2 * i})"
            for i in range(bits)
        ] + [
            f"shiftleft(shiftright({vb}, {i}) & 1, {2 * i + 1})"
            for i in range(bits)
        ]
    return "(" + " + ".join(terms) + ")"


def z_col(ub: Column | str, vb: Column | str, bits: int = ZBITS) -> Column:
    """Spark Column form of :func:`z_expr_sql` via the same builtins."""
    u = F.col(ub) if isinstance(ub, str) else ub
    v = F.col(vb) if isinstance(vb, str) else vb
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.expr(f"shiftleft(1, {2 * i})") * (
            F.shiftright(u.cast("long"), i).bitwiseAND(1))
        z = z + F.expr(f"shiftleft(1, {2 * i + 1})") * (
            F.shiftright(v.cast("long"), i).bitwiseAND(1))
    return z


def zorder_write(df: DataFrame, c1: Column, c2: Column, path: str,
                 n_files: int = 8, bits: int = ZBITS) -> None:
    """Write ``df`` z-clustered on two numeric dimensions.

    The interleave only balances if both dimensions occupy the SAME
    bit width — a column whose live range covers 4 bits interleaved
    against one covering 7 bits degenerates to a plain sort on the
    wider column (its high bits dominate every comparison). So each
    dimension is first normalized over its observed [min, max] to the
    full 2^bits bucket range; the min/max pass is one tiny aggregate
    (on a real deployment these bounds come from catalog stats or the
    existing footers instead of a scan).

    Then: Morton value (narrow map) → ``repartitionByRange`` on it
    (ONE shuffle, the same Exchange a plain sorted write costs) →
    per-partition sort → ``n_files`` files whose parquet footers carry
    tight min/max spans on BOTH dimensions at once. n_files scales
    with data; the quality claim — a predicate on EITHER dimension
    skips most files, where a one-column sort only prunes its own
    column — is measured from the written footers in
    tests/test_layout.py."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)).collect()[0]
    scale = float(1 << bits)

    def bucket(c: Column, lo, hi) -> Column:
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("long")
        norm = (c.cast("double") - float(lo)) / span * scale
        return F.least(F.lit((1 << bits) - 1), F.floor(norm).cast("long"))

    (df.withColumn("_z", z_col(bucket(c1, lo1, hi1), bucket(c2, lo2, hi2),
                               bits=bits))
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))
