"""Z-order layout quality, measured from REAL parquet footers.

q_zorder_cells proves the Morton kernel's VALUES cross-engine; this
test proves the layout's point. Parquet scan pruning skips a file when
the predicate misses the file's [min, max] span, so the expected
fraction of files a point/range lookup on a column must READ equals
the mean normalized footer-span width of that column. A one-column
sort makes its own column's spans tight and leaves the other at full
width (every lookup on the other column scans everything); z-order
keeps BOTH columns' spans narrow at once. We write the same events
rows both ways, read the per-file statistics back with pyarrow, and
compare those scan fractions.
"""
from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from engine.layout import z_col, zorder_write

N_FILES = 8


def _spans(path, cols=("user_id", "value")):
    """Per data file: {col: (min, max)} from the parquet footers."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.row_group(0).column(c).path_in_schema: c
               for c in range(md.row_group(0).num_columns)}
        span = {}
        for name in cols:
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[name]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            span[name] = (lo, hi)
        out.append(span)
    return out


def _scan_fraction(spans, col, lo, hi):
    """Mean normalized span width of ``col`` = expected fraction of
    files a uniform point lookup on ``col`` has to read."""
    width = float(hi) - float(lo) or 1.0
    return sum((s[col][1] - s[col][0]) / width for s in spans) / len(spans)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("value"), F.max("value")).collect()[0]

    one_dim = str(tmp_path / "by_user")
    (ev.repartitionByRange(N_FILES, "user_id")
       .sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(one_dim))
    zpath = str(tmp_path / "by_z")
    zorder_write(ev, F.col("user_id"), F.col("value"), zpath,
                 n_files=N_FILES)

    sp_one, sp_z = _spans(one_dim), _spans(zpath)
    assert len(sp_z) >= 4  # the range partitioner actually split

    f_one_u = _scan_fraction(sp_one, "user_id", lo_u, hi_u)
    f_one_v = _scan_fraction(sp_one, "value", lo_v, hi_v)
    f_z_u = _scan_fraction(sp_z, "user_id", lo_u, hi_u)
    f_z_v = _scan_fraction(sp_z, "value", lo_v, hi_v)

    # one-dim sort: its own column prunes hard, the other barely
    # (its residual narrowing is only value's incidental correlation
    # with user on this fixture)
    assert f_one_u < 0.35
    assert f_one_v > 0.6
    # z-order: BOTH dimensions prune — the worst dimension must beat
    # the one-dim layout's worst dimension by a wide margin (measured
    # 0.41/0.35 vs 0.77; 0.7 leaves room for range-sampling variance)
    assert max(f_z_u, f_z_v) < 0.7 * max(f_one_u, f_one_v), (
        f_z_u, f_z_v, f_one_u, f_one_v)


def test_z_col_matches_reference_interleave(spark):
    # pin the kernel against a pure-python Morton reference on the
    # 7-bit domain corners and a lattice sample
    import itertools

    def morton(u, v):
        z = 0
        for i in range(7):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((v >> i) & 1) << (2 * i + 1)
        return z

    pts = list(itertools.product([0, 1, 63, 64, 127], repeat=2))
    df = spark.createDataFrame(pts, "ub int, vb int")
    got = {(r.ub, r.vb): r.z
           for r in df.withColumn("z", z_col("ub", "vb")).collect()}
    for (u, v), z in got.items():
        assert z == morton(u, v), (u, v, z)
