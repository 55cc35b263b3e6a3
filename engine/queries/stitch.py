"""Blocked-array / stitching operators — the reference's own surface
(SURVEY.md §2.1 R1-R7, §2.2 rows 56-62), voxel-path: one row per
voxel, the kernels expressed as closed-form SQL so DuckDB can replay
them. The Arrow/applyInPandas block path lives in engine/blocks.py
and is asserted equal to these in tests.

Semantics are re-derived from the reference's observable behavior:

- R1 trapezoid weight (stitch.py:7-46 of the reference): per axis,
  over the chunk-with-halo extent L = bs + 2*o, a ones-core with
  linear ramps of length 2*o-1 on interior faces, constant 1 on
  domain-boundary faces. Closed form:
      w(b, i) = least(lw, rw)
      lw = 1 if b == 0     else least(1, i / (2o-1))
      rw = 1 if b == G-1   else least(1, (L-1-i) / (2o-1))
  which is an exact partition of unity over overlaps (verified
  property, SURVEY.md §5.2-1).
- R2 halo-merge (stitch.py:49-91): after weighting, the merged value
  at a global voxel is simply the SUM over all tiles covering it —
  a hash aggregate on global coordinates replaces the reference's
  face/edge/corner slab bookkeeping wholesale.
- R6 neighbor blend (local_affine.py:33-107): per-axis weight array
  W of length bs + o' + 1 (o' = max(0, 2*o-1)); own-block planes
  read W[j+o], the o planes facing a neighbor read mirrored edge
  weights. The reference's low-side indexing is off by one (weight
  sums > 1 on low-side overlap planes — SURVEY.md §2.1-R6); the
  engine implements the intended partition-of-unity blend by
  normalizing with the per-voxel weight sum.
- Coordinates are BIGINT throughout (the reference's int16 grid,
  local_affine.py:12, overflows at ≥32768 voxels — not copied).
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..registry import query
from .util import rnd, sql_rnd


def w1d_sql(b: str, i: str, grid: int, bs: int, o: int) -> str:
    """Closed-form R1 trapezoid weight (SQL text valid in Spark+DuckDB).

    ``i`` indexes the chunk-with-halo extent 0..bs+2o-1.
    """
    r = 2 * o - 1
    L = bs + 2 * o
    lw = f"CASE WHEN ({b}) = 0 THEN 1e0 ELSE least(1e0, ({i}) / {r}e0) END"
    rw = (f"CASE WHEN ({b}) = {grid - 1} THEN 1e0 "
          f"ELSE least(1e0, ({L - 1} - ({i})) / {r}e0) END")
    return f"least({lw}, {rw})"


def wmerge_sql(b: str, t: str, grid: int, bs: int, o: int) -> str:
    """Closed-form R6 weight-array lookup W_b[t] (length bs+o'+1)."""
    op = max(0, 2 * o - 1)
    lw = f"CASE WHEN ({b}) = 0 THEN 1e0 ELSE least(1e0, ({t}) / {op}e0) END"
    rw = (f"CASE WHEN ({b}) = {grid - 1} THEN 1e0 "
          f"ELSE least(1e0, ({bs + op} - ({t})) / {op}e0) END")
    return f"least({lw}, {rw})"


def _axes(spark, *specs: tuple[str, int]) -> DataFrame:
    """Cartesian product of named 0..n-1 ranges (grid generator, R4):
    a single ``spark.range(prod)`` decoded with div/mod — one narrow
    whole-stage-codegen projection instead of a crossJoin chain."""
    total = reduce(lambda a, b: a * b, (n for _, n in specs), 1)
    cols, stride = [], total
    for name, n in specs:
        stride //= n
        cols.append(F.expr(f"(id div {stride}) % {n}").alias(name))
    return spark.range(total).select(*cols)


# ---------------------------------------------------------------- R4

@query("q_grid_gen", oracle="""
SELECT x, y, z,
       x // 8 AS bx, y // 8 AS by, z // 8 AS bz,
       x * 2e0 AS px, y * 1.5e0 AS py, z * 1e0 AS pz
FROM generate_series(0, 15) AS t1(x),
     generate_series(0, 15) AS t2(y),
     generate_series(0, 15) AS t3(z)
""")
def q_grid_gen(spark, sf):
    """R4 position_grid (reference local_affine.py:7-13): coordinate
    grid + block ids + physical coords (spacing scaling,
    local_affine.py:119-121). meshgrid/stack/rechunk becomes three
    range cross-joins — Catalyst folds it into nested-loop generators
    with no data movement."""
    g = _axes(spark, ("x", 16), ("y", 16), ("z", 16))
    return g.select(
        "x", "y", "z",
        F.expr("x div 8").alias("bx"),
        F.expr("y div 8").alias("by"),
        F.expr("z div 8").alias("bz"),
        (F.col("x") * 2.0).alias("px"),
        (F.col("y") * 1.5).alias("py"),
        (F.col("z") * 1.0).alias("pz"),
    )


# ---------------------------------------------------------------- R5

_AFF = {  # a literal top-3x4 affine (row-major)
    "a00": 1.1, "a01": 0.0, "a02": 0.0, "a03": 2.0,
    "a10": 0.0, "a11": 0.9, "a12": 0.1, "a13": -1.0,
    "a20": 0.05, "a21": 0.0, "a22": 1.0, "a23": 0.5,
}

_R5_FIELD = {
    "dx": f"({_AFF['a00']}e0 * x + {_AFF['a01']}e0 * y + {_AFF['a02']}e0 * z + {_AFF['a03']}e0) - x",
    "dy": f"({_AFF['a10']}e0 * x + {_AFF['a11']}e0 * y + {_AFF['a12']}e0 * z + {_AFF['a13']}e0) - y",
    "dz": f"({_AFF['a20']}e0 * x + {_AFF['a21']}e0 * y + {_AFF['a22']}e0 * z + {_AFF['a23']}e0) - z",
}


@query("q_affine_field", oracle=f"""
SELECT x, y, z,
       {sql_rnd(_R5_FIELD['dx'], 6)} AS dx,
       {sql_rnd(_R5_FIELD['dy'], 6)} AS dy,
       {sql_rnd(_R5_FIELD['dz'], 6)} AS dz
FROM generate_series(0, 15) AS t1(x),
     generate_series(0, 15) AS t2(y),
     generate_series(0, 15) AS t3(z)
""")
def q_affine_field(spark, sf):
    """R5 affine_to_field (reference local_affine.py:16-30): the
    einsum matvec + translation as plain column arithmetic;
    displacement = transformed - identity grid."""
    g = _axes(spark, ("x", 16), ("y", 16), ("z", 16))
    return g.select(
        "x", "y", "z",
        F.expr(sql_rnd(_R5_FIELD["dx"], 6)).alias("dx"),
        F.expr(sql_rnd(_R5_FIELD["dy"], 6)).alias("dy"),
        F.expr(sql_rnd(_R5_FIELD["dz"], 6)).alias("dz"),
    )


# ---------------------------------------------------------------- R1

@query("q_block_weights", oracle=f"""
WITH w AS (
    SELECT b, i, b * 16 + i - 2 AS x,
           {w1d_sql('b', 'i', 4, 16, 2)} AS w
    FROM generate_series(0, 3) AS t1(b),
         generate_series(0, 19) AS t2(i))
SELECT b, i, x,
       {sql_rnd('w', 6)} AS w,
       {sql_rnd('sum(w) OVER (PARTITION BY x)', 6)} AS pou
FROM w WHERE x BETWEEN 0 AND 63
""")
def q_block_weights(spark, sf):
    """R1 weight_block (reference stitch.py:7-46), 1-D: trapezoid
    profiles incl. boundary-block constant pads; the pou column is
    the per-coordinate weight sum across blocks — exactly 1.0
    everywhere in-domain (partition of unity, SURVEY.md §5.2-1)."""
    g = _axes(spark, ("b", 4), ("i", 20))
    w = g.select(
        "b", "i",
        (F.col("b") * 16 + F.col("i") - 2).alias("x"),
        F.expr(w1d_sql("b", "i", 4, 16, 2)).alias("w"),
    ).filter(F.col("x").between(0, 63))
    from pyspark.sql import Window as W
    return w.select(
        "b", "i", "x",
        F.expr(sql_rnd("w", 6)).alias("w"),
        F.expr(sql_rnd("sum(w) OVER (PARTITION BY x)", 6)).alias("pou"),
    )


# ---------------------------------------------------------------- R1+R2 (1-D)

_V1D = ("CASE WHEN x BETWEEN 0 AND 63 "
        "THEN sin(x / 7e0) + 0.01e0 * x ELSE 0e0 END")


@query("q_stitch_1d", oracle=f"""
WITH t AS (
    SELECT b, i, b * 16 + i - 2 AS x,
           {w1d_sql('b', 'i', 4, 16, 2)} AS w
    FROM generate_series(0, 3) AS t1(b),
         generate_series(0, 19) AS t2(i)),
v AS (SELECT x, w, {_V1D} AS v FROM t)
SELECT x, {sql_rnd('sum(w * v)', 6)} AS stitched
FROM v WHERE x BETWEEN 0 AND 63 GROUP BY x
""")
def q_stitch_1d(spark, sf):
    """R1∘R2 on the B1 strip fixture: weight, then halo-merge. The
    merge (reference stitch.py:49-91's 6-face/12-edge/8-corner slab
    sums) is a single hash aggregate on the global coordinate; the
    stitched value reproduces the generating function exactly
    (round-trip invariant, SURVEY.md §5.2-2)."""
    g = _axes(spark, ("b", 4), ("i", 20))
    t = g.select(
        (F.col("b") * 16 + F.col("i") - 2).alias("x"),
        F.expr(w1d_sql("b", "i", 4, 16, 2)).alias("w"),
    ).withColumn("v", F.expr(_V1D))
    return (
        t.filter(F.col("x").between(0, 63))
        .groupBy("x")
        .agg(F.expr(sql_rnd("sum(w * v)", 6)).alias("stitched"))
    )


# ---------------------------------------------------------------- R3 (3-D)

_V3D = ("CASE WHEN x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15 "
        "AND z BETWEEN 0 AND 15 "
        "THEN (x + 1) * 1e0 + (y + 1) * 0.1e0 + (z + 1) * 0.01e0 "
        "ELSE 0e0 END")


# one oracle, two implementations: the voxel path (q_stitch_3d) and
# the Arrow block path (q_stitch_3d_blocks) are checked against the
# SAME SQL so they can never drift apart
_STITCH3D_ORACLE = f"""
WITH t AS (
    SELECT bx * 8 + ix - 2 AS x, by * 8 + iy - 2 AS y, bz * 8 + iz - 2 AS z,
           ({w1d_sql('bx', 'ix', 2, 8, 2)})
         * ({w1d_sql('by', 'iy', 2, 8, 2)})
         * ({w1d_sql('bz', 'iz', 2, 8, 2)}) AS w
    FROM generate_series(0, 1) AS t1(bx), generate_series(0, 1) AS t2(by),
         generate_series(0, 1) AS t3(bz), generate_series(0, 11) AS t4(ix),
         generate_series(0, 11) AS t5(iy), generate_series(0, 11) AS t6(iz)),
v AS (SELECT x, y, z, w, {_V3D} AS v FROM t)
SELECT x, y, z, {sql_rnd('sum(w * v)', 6)} AS stitched
FROM v
WHERE x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15 AND z BETWEEN 0 AND 15
GROUP BY x, y, z
"""


@query("q_stitch_3d", oracle=_STITCH3D_ORACLE)
def q_stitch_3d(spark, sf):
    """Full R3 stitch_blocks (reference stitch.py:94-121) on the B2
    fixture: 2×2×2 blocks of 8³ with overlap 2 (chunk-with-halo 12³,
    the blocksize+2·overlap sizing contract of SURVEY.md §3.3).
    Separable 3-D weights = product of per-axis trapezoids; the halo
    exchange is one hash aggregate on (x,y,z)."""
    g = _axes(spark, ("bx", 2), ("by", 2), ("bz", 2),
              ("ix", 12), ("iy", 12), ("iz", 12))
    t = g.select(
        (F.col("bx") * 8 + F.col("ix") - 2).alias("x"),
        (F.col("by") * 8 + F.col("iy") - 2).alias("y"),
        (F.col("bz") * 8 + F.col("iz") - 2).alias("z"),
        (F.expr(w1d_sql("bx", "ix", 2, 8, 2))
         * F.expr(w1d_sql("by", "iy", 2, 8, 2))
         * F.expr(w1d_sql("bz", "iz", 2, 8, 2))).alias("w"),
    ).withColumn("v", F.expr(_V3D))
    return (
        t.filter(F.col("x").between(0, 15) & F.col("y").between(0, 15)
                 & F.col("z").between(0, 15))
        .groupBy("x", "y", "z")
        .agg(F.expr(sql_rnd("sum(w * v)", 6)).alias("stitched"))
    )


@query("q_stitch_3d_blocks", oracle=_STITCH3D_ORACLE)
def q_stitch_3d_blocks(spark, sf):
    """R3 on the same B2 fixture as q_stitch_3d, but through the Arrow
    BLOCK path (engine/blocks.py: fused trapezoid-weight +
    keyed-fragment halo shuffle → applyInPandas reassembly → voxel
    decode) instead of the
    voxel SQL — so the scale path itself is oracle-verified, not just
    pytest-equal to the voxel path. Tile payloads are the generating
    function sampled over each chunk-with-halo extent (12³), zeros
    outside the domain — the same contract as da.map_overlap's
    boundary=0 fill (reference stitch.py:113-121)."""
    import numpy as np

    from ..blocks import field_to_voxels, make_tiles, stitch_blocks

    bs, o, g = (8, 8, 8), (2, 2, 2), (2, 2, 2)
    tiles = {}
    for b in ((bx, by, bz) for bx in range(2) for by in range(2)
              for bz in range(2)):
        ax = [np.arange(b[a] * 8 - 2, b[a] * 8 + 10, dtype=np.float64)
              for a in range(3)]
        gx, gy, gz = np.meshgrid(*ax, indexing="ij")
        # same float64 op order as the SQL fixture expression _V3D
        v = (gx + 1) * 1.0 + (gy + 1) * 0.1 + (gz + 1) * 0.01
        inside = ((gx >= 0) & (gx <= 15) & (gy >= 0) & (gy <= 15)
                  & (gz >= 0) & (gz <= 15))
        tiles[b] = np.where(inside, v, 0.0)
    df = make_tiles(spark, tiles)
    out = field_to_voxels(stitch_blocks(df, bs, o, g), bs, ncomp=1)
    return out.select("x", "y", "z", rnd(F.col("v"), 6).alias("stitched"))


# per-component generating functions of the vector-field fixture:
# three cyclic rotations of the scalar B2 function, so every
# component has a distinct value at every voxel (component mixing
# could never cancel out silently)
_V3D_C = (
    "CASE c WHEN 0 THEN (x + 1) * 1e0 + (y + 1) * 0.1e0 + (z + 1) * 0.01e0 "
    "WHEN 1 THEN (x + 1) * 0.01e0 + (y + 1) * 1e0 + (z + 1) * 0.1e0 "
    "ELSE (x + 1) * 0.1e0 + (y + 1) * 0.01e0 + (z + 1) * 1e0 END")


@query("q_stitch_3d_vec_blocks", oracle=f"""
WITH t AS (
    SELECT bx * 8 + ix - 2 AS x, by * 8 + iy - 2 AS y, bz * 8 + iz - 2 AS z,
           c,
           ({w1d_sql('bx', 'ix', 2, 8, 2)})
         * ({w1d_sql('by', 'iy', 2, 8, 2)})
         * ({w1d_sql('bz', 'iz', 2, 8, 2)}) AS w
    FROM generate_series(0, 1) AS t1(bx), generate_series(0, 1) AS t2(by),
         generate_series(0, 1) AS t3(bz), generate_series(0, 11) AS t4(ix),
         generate_series(0, 11) AS t5(iy), generate_series(0, 11) AS t6(iz),
         generate_series(0, 2) AS t7(c)),
v AS (SELECT x, y, z, c, w,
             CASE WHEN x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15
                       AND z BETWEEN 0 AND 15
                  THEN {_V3D_C} ELSE 0e0 END AS v
      FROM t)
SELECT x, y, z, CAST(c AS INT) AS c, {sql_rnd('sum(w * v)', 6)} AS stitched
FROM v
WHERE x BETWEEN 0 AND 15 AND y BETWEEN 0 AND 15 AND z BETWEEN 0 AND 15
GROUP BY x, y, z, c
""")
def q_stitch_3d_vec_blocks(spark, sf):
    """R3 over a 3-VECTOR field through the Arrow block path — the
    reference's PRIMARY use case (README.md:2: blending per-tile
    registration/displacement fields; stitch.py:100-102 promotes the
    trailing length-3 axis, stitch.py:42-46 broadcasts the scalar
    weight over it). Same B2 geometry as q_stitch_3d_blocks but each
    tile payload is (12, 12, 12, 3): the three components are cyclic
    rotations of the scalar fixture function, so the oracle verifies
    per-component values at every voxel — any component mixing or
    axis transposition in the ncomp plumbing hash-fails. The halo
    shuffle carries 3× the scalar payload bytes in the SAME number of
    fragments (slab slicing is purely spatial)."""
    import numpy as np

    from ..blocks import field_to_voxels, make_tiles, stitch_blocks

    bs, o, g = (8, 8, 8), (2, 2, 2), (2, 2, 2)
    tiles = {}
    for b in ((bx, by, bz) for bx in range(2) for by in range(2)
              for bz in range(2)):
        ax = [np.arange(b[a] * 8 - 2, b[a] * 8 + 10, dtype=np.float64)
              for a in range(3)]
        gx, gy, gz = np.meshgrid(*ax, indexing="ij")
        # same float64 op order as the SQL fixture expression _V3D_C
        comps = [
            (gx + 1) * 1.0 + (gy + 1) * 0.1 + (gz + 1) * 0.01,
            (gx + 1) * 0.01 + (gy + 1) * 1.0 + (gz + 1) * 0.1,
            (gx + 1) * 0.1 + (gy + 1) * 0.01 + (gz + 1) * 1.0,
        ]
        inside = ((gx >= 0) & (gx <= 15) & (gy >= 0) & (gy <= 15)
                  & (gz >= 0) & (gz <= 15))
        tiles[b] = np.stack(
            [np.where(inside, v, 0.0) for v in comps], axis=-1)
    df = make_tiles(spark, tiles)
    out = field_to_voxels(stitch_blocks(df, bs, o, g, ncomp=3),
                          bs, ncomp=3)
    return out.select("x", "y", "z", "c",
                      rnd(F.col("v"), 6).alias("stitched"))


# ---------------------------------------------------------------- halo shuffle

@query("q_halo_sum", oracle="""
WITH blocks AS (
    SELECT bx, by, bz, 1 + bx + 2 * by + 4 * bz AS val
    FROM generate_series(0, 2) AS t1(bx), generate_series(0, 2) AS t2(by),
         generate_series(0, 2) AS t3(bz)),
contrib AS (
    SELECT bx + dx AS tbx, by + dy AS tby, bz + dz AS tbz,
           val * (CASE WHEN dx = 0 THEN 4 ELSE 2 END)
               * (CASE WHEN dy = 0 THEN 4 ELSE 2 END)
               * (CASE WHEN dz = 0 THEN 4 ELSE 2 END) AS c
    FROM blocks,
         generate_series(-1, 1) AS o1(dx), generate_series(-1, 1) AS o2(dy),
         generate_series(-1, 1) AS o3(dz))
SELECT tbx, tby, tbz, CAST(sum(c) AS BIGINT) AS halo_total
FROM contrib
WHERE tbx BETWEEN 0 AND 2 AND tby BETWEEN 0 AND 2 AND tbz BETWEEN 0 AND 2
GROUP BY tbx, tby, tbz
""")
def q_halo_sum(spark, sf):
    """The bare map_overlap halo exchange (reference stitch.py:113-121)
    as a keyed-fragment shuffle: every block emits ≤27 slab
    contributions addressed to its neighbors (slab volume = overlap-
    or blocksize-wide per axis; bs=4, o=2 here), one shuffle, one
    aggregate. Fragments carry only slab-sized payloads — never whole
    blocks ×27 — which is what keeps this viable at 100 TB."""
    blocks = _axes(spark, ("bx", 3), ("by", 3), ("bz", 3)).withColumn(
        "val", 1 + F.col("bx") + 2 * F.col("by") + 4 * F.col("bz"))
    offs = _axes(spark, ("ox", 3), ("oy", 3), ("oz", 3)).select(
        (F.col("ox") - 1).alias("dx"), (F.col("oy") - 1).alias("dy"),
        (F.col("oz") - 1).alias("dz"))
    vol = (
        F.when(F.col("dx") == 0, 4).otherwise(2)
        * F.when(F.col("dy") == 0, 4).otherwise(2)
        * F.when(F.col("dz") == 0, 4).otherwise(2)
    )
    return (
        blocks.crossJoin(F.broadcast(offs))
        .select(
            (F.col("bx") + F.col("dx")).alias("tbx"),
            (F.col("by") + F.col("dy")).alias("tby"),
            (F.col("bz") + F.col("dz")).alias("tbz"),
            (F.col("val") * vol).alias("c"),
        )
        .filter(F.col("tbx").between(0, 2) & F.col("tby").between(0, 2)
                & F.col("tbz").between(0, 2))
        .groupBy("tbx", "tby", "tbz")
        .agg(F.sum("c").alias("halo_total"))
    )


# ---------------------------------------------------------------- R6/R7

# affines for the blend fixture (FIXTURES.md B3, x-overlap widened to
# 2 so the interior linear ramps are actually exercised):
#   block 0: identity; block 1: identity + t(2,-1,0.5);
#   block 2: diag(1.1,1,1) + t(0,0,1)
_BLEND_AFFINES = [
    (0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0),
    (1, 1.0, 0.0, 0.0, 2.0, 0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 1.0, 0.5),
    (2, 1.1, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0),
]
def _aff_row_sql(row):
    return "(" + ", ".join(
        str(v) if isinstance(v, int) else f"{v!r}e0" for v in row) + ")"


_AFF_COLS = ("nb", "a00", "a01", "a02", "a03", "a10", "a11", "a12",
             "a13", "a20", "a21", "a22", "a23")

# x axis: G=3 blocks, bs=8, o=2 (o'=3, weight array length 12)
_BW = {
    "own": wmerge_sql("b", "j + 2", 3, 8, 2),       # W_b[j + o]
    "left": wmerge_sql("b", "2 - j", 3, 8, 2),      # W_b[o - j], j < o
    "right": wmerge_sql("b", "17 - j", 3, 8, 2),    # W_b[2bs+o'-o-j], j >= bs-o
}


_BLEND_ORACLE_CORE = f"""
g AS (
    SELECT x, y, z, x // 8 AS b, x % 8 AS j
    FROM generate_series(0, 23) AS t1(x), generate_series(0, 3) AS t2(y),
         generate_series(0, 3) AS t3(z)),
c AS (
    SELECT g.*, o.d,
           CASE o.d WHEN 0 THEN {_BW['own']}
                    WHEN -1 THEN {_BW['left']}
                    ELSE {_BW['right']} END AS w
    FROM g, (VALUES (-1), (0), (1)) AS o(d)
    WHERE (o.d = 0)
       OR (o.d = -1 AND j < 2 AND b >= 1)
       OR (o.d = 1 AND j >= 6 AND b <= 1)),
a AS (SELECT * FROM (VALUES {", ".join(_aff_row_sql(r) for r in _BLEND_AFFINES)})
      AS t({", ".join(_AFF_COLS)})),
f AS (
    SELECT c.x, c.y, c.z, c.w,
           c.w * ((a00 * x + a01 * y + a02 * z + a03) - x) AS wdx,
           c.w * ((a10 * x + a11 * y + a12 * z + a13) - y) AS wdy,
           c.w * ((a20 * x + a21 * y + a22 * z + a23) - z) AS wdz
    FROM c JOIN a ON a.nb = c.b + c.d),
blend AS (
    SELECT x, y, z,
           {sql_rnd('sum(wdx) / sum(w)', 6)} AS dx,
           {sql_rnd('sum(wdy) / sum(w)', 6)} AS dy,
           {sql_rnd('sum(wdz) / sum(w)', 6)} AS dz
    FROM f WHERE x < 20 GROUP BY x, y, z)
"""


@query("q_local_affine_blend", oracle=f"""
WITH {_BLEND_ORACLE_CORE}
SELECT x, y, z, dx, dy, dz FROM blend
""")
def q_local_affine_blend(spark, sf):
    """R6/R7 local_affines_to_field (reference local_affine.py:33-139)
    with the intended, normalized partition-of-unity blend (the
    reference's low-side off-by-one — weight sums 2, 4/3, 6/5 for
    overlap 1,2,3 — is fixed by dividing by sum(w); SURVEY.md
    §2.1-R6). Voxel path: neighbor-offset explode → broadcast affine
    join → weighted aggregate; final crop (local_affine.py:136) is a
    coordinate filter. Fixture: 3×1×1 blocks of (8,4,4), x-overlap 2,
    crop to x<20."""
    g = _axes(spark, ("x", 24), ("y", 4), ("z", 4)).select(
        "x", "y", "z",
        F.expr("x div 8").alias("b"), (F.col("x") % 8).alias("j"))
    c = (
        g.select("*", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("d"))
        .filter(
            (F.col("d") == 0)
            | ((F.col("d") == -1) & (F.col("j") < 2) & (F.col("b") >= 1))
            | ((F.col("d") == 1) & (F.col("j") >= 6) & (F.col("b") <= 1)))
        .withColumn("w", F.expr(
            f"CASE d WHEN 0 THEN {_BW['own']} "
            f"WHEN -1 THEN {_BW['left']} ELSE {_BW['right']} END"))
    )
    # the per-neighbor affine is a 3-entry lookup — inline it as CASE
    # expressions on nb = b + d (constant-folds; no join, no broadcast)
    coef = {
        name: "CASE b + d " + " ".join(
            f"WHEN {row[0]} THEN {row[1 + i]!r}e0"
            for row in _BLEND_AFFINES) + " END"
        for i, name in enumerate(_AFF_COLS[1:])
    }
    f = c.select(
        "x", "y", "z", "w",
        F.expr(f"w * ((({coef['a00']}) * x + ({coef['a01']}) * y"
               f" + ({coef['a02']}) * z + ({coef['a03']})) - x)").alias("wdx"),
        F.expr(f"w * ((({coef['a10']}) * x + ({coef['a11']}) * y"
               f" + ({coef['a12']}) * z + ({coef['a13']})) - y)").alias("wdy"),
        F.expr(f"w * ((({coef['a20']}) * x + ({coef['a21']}) * y"
               f" + ({coef['a22']}) * z + ({coef['a23']})) - z)").alias("wdz"),
    )
    return (
        f.filter(F.col("x") < 20)
        .groupBy("x", "y", "z")
        .agg(
            F.expr(sql_rnd("sum(wdx) / sum(w)", 6)).alias("dx"),
            F.expr(sql_rnd("sum(wdy) / sum(w)", 6)).alias("dy"),
            F.expr(sql_rnd("sum(wdz) / sum(w)", 6)).alias("dz"),
        )
    )


@query("q_local_affine_blend_blocks", oracle=f"""
WITH {_BLEND_ORACLE_CORE}
SELECT x, y, z, c, CASE c WHEN 0 THEN dx WHEN 1 THEN dy ELSE dz END AS dv
FROM blend, (VALUES (0), (1), (2)) AS t(c)
""")
def q_local_affine_blend_blocks(spark, sf):
    """R6/R7 on the same fixture as q_local_affine_blend, but through
    the Arrow BLOCK path (engine/blocks.py local_affines_to_field:
    broadcast affines, one mapInPandas task per block, zero
    inter-block exchange — the delayed(affines) pattern of reference
    local_affine.py:124-133) so the blend's scale path is itself
    driver-oracle-verified. Output is the voxel decode, one row per
    (voxel, component c∈{0,1,2}), cropped to x < 20 (the R7 crop,
    local_affine.py:136)."""
    import numpy as np

    from ..blocks import field_to_voxels, local_affines_to_field

    aff = np.zeros((3, 1, 1, 4, 4))
    for row in _BLEND_AFFINES:
        m = np.eye(4)
        m[:3, :] = np.asarray(row[1:], dtype=np.float64).reshape(3, 4)
        aff[row[0], 0, 0] = m
    field = local_affines_to_field(
        spark, aff, blocksize=(8, 4, 4), overlap=(2, 0, 0),
        spacing=(1.0, 1.0, 1.0), shape=(20, 4, 4), displacement=True)
    out = field_to_voxels(field, (8, 4, 4), ncomp=3)
    return (
        out.filter(F.col("x") < 20)
        .select("x", "y", "z", "c", rnd(F.col("v"), 6).alias("dv"))
    )


# ------------------------------------------------- map_overlap user fn

@query("q_stitch_user_fn", oracle=f"""
WITH t AS (
    SELECT bx * 8 + ix - 2 AS x, by * 8 + iy - 2 AS y, bz * 8 + iz - 2 AS z,
           ({w1d_sql('bx', 'ix', 3, 8, 2)})
         * ({w1d_sql('by', 'iy', 3, 8, 2)})
         * ({w1d_sql('bz', 'iz', 3, 8, 2)}) AS w
    FROM generate_series(0, 2) AS t1(bx), generate_series(0, 2) AS t2(by),
         generate_series(0, 2) AS t3(bz), generate_series(0, 11) AS t4(ix),
         generate_series(0, 11) AS t5(iy), generate_series(0, 11) AS t6(iz))
SELECT x, y, z,
       {sql_rnd('sum(w * (x*x + y*y + z*z + 2e0))', 6)} AS blurred
FROM t
WHERE x BETWEEN 0 AND 23 AND y BETWEEN 0 AND 23 AND z BETWEEN 0 AND 23
GROUP BY x, y, z
""")
def q_stitch_user_fn(spark, sf):
    """End-to-end ``map_overlap`` user-function lifecycle — the
    library's intended use (reference README.md:2 + stitch.py:113-121:
    a per-tile function over halo'd tiles, then feather-stitch), as
    one fused lineage via engine/blocks.py:map_overlap_stitch.

    Fixture: a 3x3x3 grid of 8^3 blocks (24^3 domain — unlike the B2
    fixtures this has a fully-INTERIOR block, so the no-boundary-face
    weight class is exercised), overlap 2, user kernel = 3x3x3 box
    mean. Tiles carry depth=1 EXTRA halo rings (extent 14^3) so the
    valid-mode blur covers the whole 12^3 stitch extent with true
    neighbor data — the map_overlap sizing contract (SURVEY.md §3.3).

    Oracle: the generating field f(x,y,z) = x^2+y^2+z^2 is defined on
    all of Z^3, and the 27-point box mean of a quadratic has the exact
    closed form f+2 (per-axis second central moment = 2/3); the SQL
    replays the per-tile trapezoid weights against that closed form,
    so BOTH the blur arithmetic and the partition-of-unity stitch are
    value-checked at every voxel. Exactness: tile samples are integers
    (< 2^53), the box-sum's partials stay integral so float64 addition
    is exact, and S/27 with S = 27k divides exactly — the engine-side
    blurred values are bit-exact integers before weighting.

    Scale: identical movement profile to q_stitch_3d_blocks — the
    user kernel runs inside the ONE fragment-emit Arrow crossing and
    adds no shuffle; pad rings are read-side only (fragments still
    carry bs+2o slabs)."""
    import numpy as np

    from ..blocks import field_to_voxels, make_tiles, map_overlap_stitch

    bs, o, g, depth = (8, 8, 8), (2, 2, 2), (3, 3, 3), 1
    tiles = {}
    for b in ((bx, by, bz) for bx in range(3) for by in range(3)
              for bz in range(3)):
        # chunk-with-halo extent PLUS the user-fn pad: 8 + 2*(2+1) = 14
        ax = [np.arange(b[a] * 8 - 3, b[a] * 8 + 11, dtype=np.float64)
              for a in range(3)]
        gx, gy, gz = np.meshgrid(*ax, indexing="ij")
        tiles[b] = gx * gx + gy * gy + gz * gz
    df = make_tiles(spark, tiles)

    def box3(arr, b):
        # valid-mode 3^3 box mean: consumes the depth-1 pad per side.
        # Partial sums are exact (integer-valued float64 < 2^53).
        s = np.zeros(tuple(n - 2 for n in arr.shape), dtype=np.float64)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    s += arr[dx:dx + s.shape[0], dy:dy + s.shape[1],
                             dz:dz + s.shape[2]]
        return s / 27.0

    out = field_to_voxels(
        map_overlap_stitch(df, box3, bs, o, g, depth=depth), bs, ncomp=1)
    return out.select("x", "y", "z", rnd(F.col("v"), 6).alias("blurred"))
