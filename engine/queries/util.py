"""Cross-engine hash-match conventions.

Spark's ``round()`` (HALF_UP on the shortest decimal repr) and
DuckDB's ``round()`` (scaled-multiply, half away) disagree on ~0.1%
of rows for computed doubles — measured on the sf0.01 fixtures. The
engine therefore quantizes floats with pure IEEE-754 arithmetic that
every engine evaluates bit-identically:

    q(x, n) = floor(x * 10^n + 0.5) / 10^n

and money-style SUMs accumulate the scaled BIGINT (order-independent,
exact) before one final division.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F


def rnd(col: Column | str, n: int = 4) -> Column:
    """Deterministic cross-engine quantization of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    p = float(10 ** n)
    return F.floor(c * p + F.lit(0.5)) / p


def sql_rnd(expr: str, n: int = 4) -> str:
    """The oracle-side spelling of :func:`rnd` (valid DuckDB + Spark SQL)."""
    p = 10 ** n
    return f"(floor(({expr}) * {p} + 0.5) / {p})"


def hexpoly_sql(col: str) -> str:
    """BIGINT from the first 8 hex chars of an md5-hex column —
    positional arithmetic both engines evaluate bit-identically."""
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substr({col}, {i}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"({terms})"


def hexpoly_col(mcol: Column | str) -> Column:
    """Spark-side twin of :func:`hexpoly_sql`: the same 32-bit value
    from the first 8 hex chars, via the built-in base conversion
    (one expression node instead of 16 — smaller codegen, measurably
    faster warm). Oracles keep the positional-arithmetic spelling
    because DuckDB has no hex→int builtin with matching semantics."""
    m = F.col(mcol) if isinstance(mcol, str) else mcol
    return F.conv(F.substring(m, 1, 8), 16, 10).cast("long")


def hex32_sql(expr: str) -> str:
    """A 32-bit integer from the first 8 hex chars of ``md5(expr)``,
    written as plain positional arithmetic so Spark SQL and DuckDB
    produce bit-identical BIGINTs (neither engine's hex-parse builtin
    matches the other's). This is the cross-engine content hash used
    by MinHash/SimHash/fingerprint operators — never engine-native
    ``hash()``. Engine-side plans should md5 once into a column and
    apply :func:`hexpoly_sql` to avoid 8 hash evaluations."""
    return hexpoly_sql(f"md5({expr})")


def dsum(col: Column | str, n: int = 4) -> Column:
    """Exact order-independent sum of a double quantized to n decimals."""
    c = F.col(col) if isinstance(col, str) else col
    p = float(10 ** n)
    return F.sum(F.floor(c * p + F.lit(0.5)).cast("long")).cast("double") / p


def sql_dsum(expr: str, n: int = 4) -> str:
    p = 10 ** n
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {p} + 0.5) AS BIGINT)) AS DOUBLE) / {p})"
    )


#: 128-bit integer lane for sums of integer PRODUCTS (rank-weighted
#: sums, co-moments, cubic tie terms): per-row products of scaled
#: values can sit near 2^63 and their SUMS cross it at the 10x/100x
#: probe grains — under this ANSI config that is a hard
#: ARITHMETIC_OVERFLOW, not a wrap. DuckDB widens BIGINT sums to
#: HUGEINT natively, so oracles mirror with CAST(... AS DOUBLE) (or
#: HUGEINT operand casts where the per-row product itself crosses).
DEC128 = "decimal(38,0)"


def prod128(a: Column, b: Column) -> Column:
    """a·b with the FIRST operand widened to decimal(38,0), so the
    multiply itself runs in the 128-bit lane — for products whose
    int64 form can cross 2^63 per row (the q_mann_whitney t³
    lesson: casting only the sum input leaves the long multiply
    in the plan)."""
    return a.cast(DEC128) * b


def sum128(col: Column, out: str = "double") -> Column:
    """Exact order-independent sum in the 128-bit lane; ``out``
    picks the result lane ("double" for closed-form statistics,
    "decimal" to keep integer exactness downstream)."""
    s = F.sum(col.cast(DEC128))
    return s if out == "decimal" else s.cast("double")


def artifact_root() -> str:
    """User-owned root for PERSISTED cross-run artifacts (IVF/PQ
    codebooks, t-digest state). ``$ENGINE_ARTIFACT_DIR`` overrides;
    default ``~/.cache/engine``. A predictable artifact name in the
    world-shared ``tempfile.gettempdir()`` would let another local
    user pre-create the directory and poison query results (round-7
    ADVICE.md), so the root is created ``0o700`` and an existing one
    must be owned by the current user and not group/world-writable.
    Per-process scratch (pid-suffixed sinks/sources) stays in the
    tempdir — those names are not stable across runs."""
    import os
    import stat

    root = os.environ.get("ENGINE_ARTIFACT_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "engine")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise RuntimeError(
            f"artifact root {root} is owned by uid {st.st_uid}, not "
            f"the current user — refusing to trust artifacts there")
    if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
        raise RuntimeError(
            f"artifact root {root} is group/world-writable — another "
            f"user could plant poisoned artifacts; chmod 700 it")
    return root
