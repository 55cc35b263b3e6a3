"""Golden invariants of the blocked-array subsystem (SURVEY.md §5.2),
plus block-path ≡ voxel-path equality. The kernels were re-derived
from the reference's observable behavior; these properties pin them.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from engine.blocks import (
    axis_weights,
    field_to_voxels,
    local_affines_to_field,
    make_tiles,
    merge_axis_weights,
    stitch_blocks,
)

# ------------------------------------------------------------ pure numpy


@given(
    grid=st.integers(1, 6),
    bs=st.integers(4, 24),
    o=st.integers(1, 5),
)
@settings(max_examples=60, deadline=None)
def test_partition_of_unity(grid, bs, o):
    """SURVEY §5.2-1: per-coordinate weight sums across blocks are
    exactly 1 in-domain, for any grid/blocksize/overlap."""
    if bs < 2 * o:  # reference sizing contract: core length >= 2
        return
    total = np.zeros(grid * bs)
    for b in range(grid):
        w = axis_weights(b, grid, bs, o)
        lo = b * bs - o
        for i, wi in enumerate(w):
            x = lo + i
            if 0 <= x < grid * bs:
                total[x] += wi
    assert np.allclose(total, 1.0, atol=1e-12)


@given(grid=st.integers(1, 5), bs=st.integers(4, 16), o=st.integers(0, 4))
@settings(max_examples=40, deadline=None)
def test_merge_weights_positive_own(grid, bs, o):
    """The R6 own-block weight is > 0 on every plane (so the
    normalized blend is always well-defined)."""
    if o > 0 and bs < 2 * o:
        return
    for b in range(grid):
        W = merge_axis_weights(b, grid, bs, o)
        own = W[o:o + bs]
        assert (own > 0).all()


def _tiles_from_array(arr, grid, bs, o):
    """Cut a domain array into chunk-with-halo tiles (zero padding
    outside the domain — the reference's boundary=0)."""
    padded = np.pad(arr, [(oo, oo) for oo in o])
    tiles = {}
    for bx in range(grid[0]):
        for by in range(grid[1]):
            for bz in range(grid[2]):
                sl = tuple(
                    slice(b * s, b * s + s + 2 * oo)
                    for b, s, oo in zip((bx, by, bz), bs, o))
                tiles[(bx, by, bz)] = padded[sl]
    return tiles


@pytest.fixture(scope="module")
def roundtrip(spark):
    rng = np.random.default_rng(42)
    grid, bs, o = (2, 3, 2), (6, 8, 6), (2, 2, 2)
    shape = tuple(g * b for g, b in zip(grid, bs))
    arr = rng.normal(size=shape)
    tiles = _tiles_from_array(arr, grid, bs, o)
    df = make_tiles(spark, tiles)
    out = stitch_blocks(df, bs, o, grid).collect()
    rebuilt = np.zeros(shape)
    for row in out:
        sl = tuple(slice(b * s, (b + 1) * s)
                   for b, s in zip((row.bx, row.by, row.bz), bs))
        rebuilt[sl] = np.frombuffer(row.data, dtype=np.float64).reshape(bs)
    return arr, rebuilt


def test_stitch_roundtrip(roundtrip):
    """SURVEY §5.2-2: weighting + halo-merge reconstructs the source
    array (float64 here, so tighter than the reference's 1.8e-7)."""
    arr, rebuilt = roundtrip
    assert np.abs(arr - rebuilt).max() < 1e-12


def _tiles_from_field(field, grid, bs, o):
    """Vector-field variant of _tiles_from_array: pad the three
    spatial axes only — the trailing component axis is never padded
    or sliced (reference stitch.py:100-102 promotes blocksize/overlap
    with a zero-overlap trailing entry for exactly this reason)."""
    padded = np.pad(field, [(oo, oo) for oo in o] + [(0, 0)])
    tiles = {}
    for bx in range(grid[0]):
        for by in range(grid[1]):
            for bz in range(grid[2]):
                sl = tuple(
                    slice(b * s, b * s + s + 2 * oo)
                    for b, s, oo in zip((bx, by, bz), bs, o))
                tiles[(bx, by, bz)] = padded[sl]
    return tiles


def test_stitch_roundtrip_vector_field(spark):
    """SURVEY §5.2-2 for the reference's PRIMARY use case (README.md:2
    — blending per-tile displacement fields; stitch.py:100-102):
    a random (X, Y, Z, 3) vector field cut into chunk-with-halo tiles
    round-trips through the ncomp=3 block path exactly, and each
    component equals its own independent scalar stitch (the weight is
    purely spatial, so components never mix)."""
    rng = np.random.default_rng(7)
    grid, bs, o = (2, 2, 1), (6, 4, 6), (2, 1, 2)
    shape = tuple(g * b for g, b in zip(grid, bs))
    field = rng.normal(size=shape + (3,))
    df = make_tiles(spark, _tiles_from_field(field, grid, bs, o))
    rebuilt = np.zeros(shape + (3,))
    for row in stitch_blocks(df, bs, o, grid, ncomp=3).collect():
        sl = tuple(slice(b * s, (b + 1) * s)
                   for b, s in zip((row.bx, row.by, row.bz), bs))
        rebuilt[sl] = np.frombuffer(
            row.data, dtype=np.float64).reshape(bs + (3,))
    assert np.abs(field - rebuilt).max() < 1e-12

    # component independence: ncomp=3 ≡ three scalar stitches
    c = 1
    dfc = make_tiles(
        spark, _tiles_from_array(field[..., c], grid, bs, o))
    scalar = np.zeros(shape)
    for row in stitch_blocks(dfc, bs, o, grid).collect():
        sl = tuple(slice(b * s, (b + 1) * s)
                   for b, s in zip((row.bx, row.by, row.bz), bs))
        scalar[sl] = np.frombuffer(row.data, dtype=np.float64).reshape(bs)
    assert np.abs(rebuilt[..., c] - scalar).max() < 1e-12


def test_weight_blocks_vector_broadcasts_spatial_weight(spark):
    """weight_blocks(ncomp=3) multiplies every component by the SAME
    spatial trapezoid — pinned against the scalar kernel."""
    from engine.blocks import weight_blocks

    grid, bs, o = (2, 1, 1), (4, 4, 4), (1, 1, 1)
    rng = np.random.default_rng(3)
    ext = tuple(b + 2 * oo for b, oo in zip(bs, o))
    tiles = {(bx, 0, 0): rng.normal(size=ext + (3,)) for bx in range(2)}
    df = make_tiles(spark, tiles)
    for row in weight_blocks(df, bs, o, grid, ncomp=3).collect():
        got = np.frombuffer(row.data, dtype=np.float64).reshape(ext + (3,))
        w = (axis_weights(row.bx, 2, 4, 1)[:, None, None]
             * axis_weights(0, 1, 4, 1)[None, :, None]
             * axis_weights(0, 1, 4, 1)[None, None, :])
        want = tiles[(row.bx, 0, 0)] * w[..., None]
        assert np.abs(got - want).max() < 1e-12


def test_stitch_constant_invariance(spark):
    grid, bs, o = (2, 1, 1), (4, 4, 4), (1, 1, 1)
    tiles = _tiles_from_array(
        np.full((8, 4, 4), 7.5), grid, bs, o)
    df = make_tiles(spark, tiles)
    for row in stitch_blocks(df, bs, o, grid).collect():
        vals = np.frombuffer(row.data, dtype=np.float64)
        assert np.allclose(vals, 7.5, atol=1e-12)


# ------------------------------------------------------------ affine blend


def _identity_affines(g):
    aff = np.zeros(g + (4, 4))
    aff[..., range(4), range(4)] = 1.0
    return aff


def test_identity_affines_zero_displacement(spark):
    """SURVEY §5.2-3: identity affines ⇒ exactly zero displacement."""
    g, bs, o = (2, 2, 1), (4, 4, 4), (1, 1, 1)
    df = local_affines_to_field(
        spark, _identity_affines(g), bs, o, (1.0, 1.0, 1.0))
    vals = np.concatenate([
        np.frombuffer(row.data, dtype=np.float64) for row in df.collect()])
    assert np.abs(vals).max() == 0.0


def test_uniform_affine_consistency(spark):
    """SURVEY §5.2-4: with the same affine in every block, the
    normalized blend equals that affine's field everywhere — including
    the low-side overlap planes where the literal reference
    over-weights (the documented off-by-one, local_affine.py:85-88)."""
    g, bs, o = (3, 1, 1), (4, 4, 4), (2, 1, 1)
    aff = _identity_affines(g)
    aff[..., 0, 0] = 1.25
    aff[..., 0, 3] = 2.0
    aff[..., 1, 3] = -0.5
    sp = (2.0, 1.0, 1.0)
    df = local_affines_to_field(spark, aff, bs, o, sp)
    for row in df.collect():
        field = np.frombuffer(row.data, dtype=np.float64).reshape(4, 4, 4, 3)
        xs = (np.arange(row.bx * 4, row.bx * 4 + 4) * sp[0])
        expect_dx = 1.25 * xs + 2.0 - xs
        assert np.allclose(field[..., 0], expect_dx[:, None, None], atol=1e-12)
        assert np.allclose(field[..., 1], -0.5, atol=1e-12)
        assert np.allclose(field[..., 2], 0.0, atol=1e-12)


def test_crop_semantics(spark):
    """SURVEY §5.2-5: the R7 crop (coordinate filter) yields exactly
    `shape` voxels regardless of block-grid rounding."""
    g, bs, o = (2, 1, 1), (4, 4, 4), (1, 1, 1)
    df = local_affines_to_field(
        spark, _identity_affines(g), bs, o, (1.0, 1.0, 1.0))
    vox = field_to_voxels(df, bs, ncomp=3)
    shape = (6, 3, 4)
    n = (vox.filter((vox.x < shape[0]) & (vox.y < shape[1]) & (vox.z < shape[2]))
         .count())
    assert n == shape[0] * shape[1] * shape[2] * 3


# ------------------------------------------------------------ block ≡ voxel


def test_block_path_equals_voxel_path_stitch(spark):
    """The Arrow block path reproduces q_stitch_3d (B2 fixture)."""
    from engine.registry import QUERIES, load_all

    load_all()
    voxel = {
        (r.x, r.y, r.z): r.stitched
        for r in QUERIES["q_stitch_3d"](spark, "/root/testdata/sf0.001").collect()
    }
    grid, bs, o = (2, 2, 2), (8, 8, 8), (2, 2, 2)

    def v(x, y, z):
        if 0 <= x < 16 and 0 <= y < 16 and 0 <= z < 16:
            return (x + 1) * 1.0 + (y + 1) * 0.1 + (z + 1) * 0.01
        return 0.0

    xs = np.arange(-2, 18)
    vol = np.array([[[v(x, y, z) for z in xs] for y in xs] for x in xs])
    tiles = {}
    for bx in range(2):
        for by in range(2):
            for bz in range(2):
                sl = tuple(slice(b * 8, b * 8 + 12) for b in (bx, by, bz))
                tiles[(bx, by, bz)] = vol[sl]
    df = make_tiles(spark, tiles)
    out = stitch_blocks(df, bs, o, grid)
    vox_rows = field_to_voxels(out, bs, ncomp=1).collect()
    assert len(vox_rows) == len(voxel)
    for r in vox_rows:
        q = np.floor(r.v * 1e6 + 0.5) / 1e6
        assert q == pytest.approx(voxel[(r.x, r.y, r.z)], abs=2e-6)


def test_block_path_equals_voxel_path_blend(spark):
    """The Arrow block path reproduces q_local_affine_blend (B3
    fixture, x-overlap 2, crop x<20)."""
    from engine.queries.stitch import _BLEND_AFFINES
    from engine.registry import QUERIES, load_all

    load_all()
    voxel = {
        (r.x, r.y, r.z): (r.dx, r.dy, r.dz)
        for r in QUERIES["q_local_affine_blend"](
            spark, "/root/testdata/sf0.001").collect()
    }
    aff = np.zeros((3, 1, 1, 4, 4))
    aff[..., 3, 3] = 1.0
    for row in _BLEND_AFFINES:
        b = row[0]
        aff[b, 0, 0, 0, :] = row[1:5]
        aff[b, 0, 0, 1, :] = row[5:9]
        aff[b, 0, 0, 2, :] = row[9:13]
    df = local_affines_to_field(
        spark, aff, (8, 4, 4), (2, 1, 1), (1.0, 1.0, 1.0))
    vox = field_to_voxels(df, (8, 4, 4), ncomp=3).filter("x < 20").collect()
    assert len(vox) == len(voxel) * 3
    for r in vox:
        got = np.floor(r.v * 1e6 + 0.5) / 1e6
        assert got == pytest.approx(voxel[(r.x, r.y, r.z)][r.c], abs=2e-6)


def test_reference_off_by_one_documented():
    """Empirically pin the documented divergence (SURVEY §2.1-R6): a
    literal re-implementation of the reference's low-side weight
    lookup (local_affine.py:85-88 — weight slice(o, 0, -1) against an
    array whose pads are o' = 2o-1 wide) over-weights the first `o`
    planes of a non-first block: own + left-neighbor weight sums reach
    2, 4/3, 6/5 for overlap 1, 2, 3. The engine's normalized blend
    divides these out (test_uniform_affine_consistency proves the
    fixed invariant)."""
    expected = {1: 2.0, 2: 4 / 3, 3: 6 / 5}
    bs, grid, b = 16, 3, 1  # interior block
    for o, worst in expected.items():
        W = merge_axis_weights(b, grid, bs, o)
        # literal reference indexing for plane j of the low slab:
        # own weight W[j+o], left-neighbor weight W[o-j] (mirrored
        # slice(o, 0, -1)) — reference local_affine.py:86-88
        sums = [W[j + o] + W[o - j] for j in range(o)]
        assert max(sums) == pytest.approx(worst, abs=1e-12)
        # high side is exactly a partition of unity in the reference
        op = max(0, 2 * o - 1)
        hi_sums = [
            W[j + o] + W[2 * bs + op - o - j]
            for j in range(bs - o, bs)
        ]
        assert all(s == pytest.approx(1.0, abs=1e-12) for s in hi_sums)


def test_blend_matches_numpy_oracle(spark):
    """Independent numpy re-computation of the normalized blend for a
    random affine grid — the block path must agree to float64."""
    rng = np.random.default_rng(7)
    g, bs, o = (3, 2, 1), (6, 4, 4), (2, 1, 1)
    aff = _identity_affines(g)
    aff[..., :3, :] += rng.normal(scale=0.05, size=g + (3, 4))
    sp = (1.5, 1.0, 2.0)
    df = local_affines_to_field(spark, aff, bs, o, sp)
    from itertools import product as iproduct

    from engine.blocks import merge_axis_weights as mw
    for row in df.collect():
        b = (row.bx, row.by, row.bz)
        field = np.frombuffer(row.data, dtype=np.float64).reshape(bs + (3,))
        axes = [np.arange(b[a] * bs[a], (b[a] + 1) * bs[a]) * sp[a]
                for a in range(3)]
        gx, gy, gz = np.meshgrid(*axes, indexing="ij")
        coords = np.stack([gx, gy, gz], -1)
        acc = np.zeros(bs + (3,))
        wsum = np.zeros(bs)
        for d in iproduct((-1, 0, 1), repeat=3):
            nb = tuple(b[a] + d[a] for a in range(3))
            if not all(0 <= nb[a] < g[a] for a in range(3)):
                continue
            W = [mw(b[a], g[a], bs[a], o[a]) for a in range(3)]
            sl, wv = [], []
            for a in range(3):
                oa, opa = o[a], max(0, 2 * o[a] - 1)
                if d[a] == 0:
                    sl.append(slice(None))
                    wv.append(W[a][oa:oa + bs[a]])
                elif d[a] == -1:
                    sl.append(slice(0, oa))
                    wv.append(W[a][oa - np.arange(oa)])
                else:
                    sl.append(slice(bs[a] - oa, bs[a]))
                    j = np.arange(bs[a] - oa, bs[a])
                    wv.append(W[a][2 * bs[a] + opa - oa - j])
            w3 = wv[0][:, None, None] * wv[1][None, :, None] * wv[2][None, None, :]
            m = aff[nb]
            sub = coords[tuple(sl)]
            vec = sub @ m[:3, :3].T + m[:3, 3] - sub
            acc[tuple(sl)] += vec * w3[..., None]
            wsum[tuple(sl)] += w3
        assert np.allclose(field, acc / wsum[..., None], atol=1e-12)


def test_crop_prunes_whole_blocks(spark):
    """shape= prunes blocks wholly outside the crop before any
    compute (partition pruning for the R7 crop)."""
    g, bs, o = (3, 1, 1), (4, 4, 4), (1, 1, 1)
    aff = _identity_affines(g)
    full = local_affines_to_field(spark, aff, bs, o, (1, 1, 1))
    pruned = local_affines_to_field(spark, aff, bs, o, (1, 1, 1), shape=(3, 4, 4))
    assert full.count() == 3
    assert pruned.count() == 1


def test_fused_stitch_equals_unfused_weight_then_merge(spark):
    # stitch_blocks fuses the trapezoid weighting into the
    # fragment-emit pass; it must stay bit-identical to the unfused
    # composition weight_blocks ∘ merge_overlaps
    from engine.blocks import merge_overlaps, weight_blocks

    bs, o, g = (8, 8, 8), (2, 2, 2), (2, 2, 2)
    ext = tuple(b + 2 * oo for b, oo in zip(bs, o))
    rng = np.random.default_rng(7)
    tiles = {(bx, by, bz): rng.normal(size=ext)
             for bx in range(2) for by in range(2) for bz in range(2)}
    df = make_tiles(spark, tiles)
    fused = {(r.bx, r.by, r.bz): np.frombuffer(r.data, dtype=np.float64)
             for r in stitch_blocks(df, bs, o, g).collect()}
    unfused = {(r.bx, r.by, r.bz): np.frombuffer(r.data, dtype=np.float64)
               for r in merge_overlaps(
                   weight_blocks(df, bs, o, g), bs, o, g).collect()}
    assert fused.keys() == unfused.keys()
    for k in fused:
        assert np.array_equal(fused[k], unfused[k]), k


def test_map_overlap_identity_equals_stitch_blocks(spark):
    """map_overlap_stitch with depth=0 and the identity user fn is
    BIT-equal to stitch_blocks on a random fixture — the user-fn
    lifecycle adds nothing to the stitch arithmetic itself."""
    from engine.blocks import map_overlap_stitch

    rng = np.random.default_rng(7)
    grid, bs, o = (2, 2, 2), (8, 8, 8), (2, 2, 2)
    tiles = {
        (bx, by, bz): rng.normal(size=(12, 12, 12))
        for bx in range(2) for by in range(2) for bz in range(2)
    }
    df = make_tiles(spark, tiles)
    base = {(r.x, r.y, r.z): r.v for r in field_to_voxels(
        stitch_blocks(df, bs, o, grid), bs, ncomp=1).collect()}
    lifted = {(r.x, r.y, r.z): r.v for r in field_to_voxels(
        map_overlap_stitch(df, lambda a, b: a, bs, o, grid, depth=0),
        bs, ncomp=1).collect()}
    assert base == lifted


def test_map_overlap_vector_field_box_blur(spark):
    """halo_pad x ncomp interaction: a valid-mode box blur over a
    3-VECTOR field (tiles (14,14,14,3)) must stitch to the exact
    closed form per component — catches any trailing-axis mishandling
    in the padded reshape or the weight broadcast."""
    from engine.blocks import field_to_voxels, make_tiles, map_overlap_stitch

    bs, o, g, depth = (8, 8, 8), (2, 2, 2), (2, 2, 2), 1
    tiles = {}
    for b in ((bx, by, bz) for bx in range(2) for by in range(2)
              for bz in range(2)):
        ax = [np.arange(b[a] * 8 - 3, b[a] * 8 + 11, dtype=np.float64)
              for a in range(3)]
        gx, gy, gz = np.meshgrid(*ax, indexing="ij")
        # distinct quadratic per component: blur adds exactly +2, +4,
        # +6 respectively (per-axis second central moment 2/3 scaled)
        comps = [gx * gx + gy * gy + gz * gz,
                 2.0 * (gx * gx + gy * gy + gz * gz),
                 3.0 * (gx * gx + gy * gy + gz * gz)]
        tiles[b] = np.stack(comps, axis=-1)
    df = make_tiles(spark, tiles)

    def box3(arr, b):
        s = np.zeros(tuple(n - 2 for n in arr.shape[:3]) + arr.shape[3:])
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    s += arr[dx:dx + s.shape[0], dy:dy + s.shape[1],
                             dz:dz + s.shape[2]]
        return s / 27.0

    out = field_to_voxels(
        map_overlap_stitch(df, box3, bs, o, g, depth=depth, ncomp=3),
        bs, ncomp=3).collect()
    assert len(out) == 16 ** 3 * 3
    for r in out:
        f = float(r.x ** 2 + r.y ** 2 + r.z ** 2)
        expect = (r.c + 1) * f + (r.c + 1) * 2.0
        q = np.floor(r.v * 1e6 + 0.5) / 1e6
        assert q == expect, (r, expect)
