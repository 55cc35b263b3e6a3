"""Instrument the 128-cube block path from INSIDE the Python workers:
each mapInPandas stage prints per-phase wall times (first-batch wait,
numpy compute, inter-batch gap = Arrow write-back + next read) to the
executor stderr, which in local mode is this console."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import engine.session as sess
from engine.blocks import FRAG_SCHEMA, BLOCK_SCHEMA, _weight_fn

grid, bs, o = (2, 2, 2), (128, 128, 128), (4, 4, 4)
ext = tuple(b + 2 * oo for b, oo in zip(bs, o))


def main() -> None:
    spark = sess.get_spark("diag_worker")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    ids = spark.range(8).select(
        (F.col("id") % 2).alias("bx"),
        (F.expr("id div 2") % 2).alias("by"),
        (F.expr("id div 4") % 2).alias("bz"),
    ).repartition(8)

    def gen(batches):
        t_start = time.monotonic()
        pid = os.getpid()
        nb = 0
        for pdf in batches:
            t_recv = time.monotonic()
            out = []
            for r in pdf.itertuples(index=False):
                rng = np.random.default_rng(int(r.bx * 4 + r.by * 2 + r.bz))
                out.append((r.bx, r.by, r.bz,
                            rng.normal(size=ext).ravel().tobytes()))
            t_comp = time.monotonic()
            print(f"[gen pid={pid}] wait={t_recv-t_start:.2f} "
                  f"compute={t_comp-t_recv:.2f}", file=sys.stderr, flush=True)
            yield pd.DataFrame(out, columns=["bx", "by", "bz", "data"])
            t_start = time.monotonic()
            nb += 1

    tiles = ids.mapInPandas(gen, BLOCK_SCHEMA)

    from itertools import product
    pre = _weight_fn(bs, o, grid)

    def emit(batches):
        t_start = time.monotonic()
        pid = os.getpid()
        for pdf in batches:
            t_recv = time.monotonic()
            out = []
            for row in pdf.itertuples(index=False):
                b = (row.bx, row.by, row.bz)
                arr = np.frombuffer(row.data, dtype=np.float64).reshape(ext)
                arr = pre(arr, b)
                for d in product((-1, 0, 1), repeat=3):
                    t = tuple(b[a] + d[a] for a in range(3))
                    if not all(0 <= t[a] < grid[a] for a in range(3)):
                        continue
                    sl, place, shape = [], [], []
                    ok = True
                    for a in range(3):
                        lo = max(t[a] * bs[a], b[a] * bs[a] - o[a])
                        hi = min((t[a] + 1) * bs[a], b[a] * bs[a] + bs[a] + o[a])
                        if hi <= lo:
                            ok = False
                            break
                        tile0 = b[a] * bs[a] - o[a]
                        sl.append(slice(lo - tile0, hi - tile0))
                        place.append(lo - t[a] * bs[a])
                        shape.append(hi - lo)
                    if not ok:
                        continue
                    out.append((*t, *place, *shape,
                                np.ascontiguousarray(arr[tuple(sl)]).tobytes()))
            t_comp = time.monotonic()
            print(f"[emit pid={pid}] wait={t_recv-t_start:.2f} "
                  f"compute={t_comp-t_recv:.2f} rows_in={len(pdf)}",
                  file=sys.stderr, flush=True)
            yield pd.DataFrame(
                out, columns=["tbx", "tby", "tbz", "px", "py", "pz",
                              "sx", "sy", "sz", "payload"])
            t_start = time.monotonic()

    frags = tiles.mapInPandas(emit, FRAG_SCHEMA)

    def assemble(key, pdf):
        t0 = time.monotonic()
        acc = np.zeros(bs, dtype=np.float64)
        for row in pdf.itertuples(index=False):
            shp = (row.sx, row.sy, row.sz)
            sl = tuple(slice(p, p + s)
                       for p, s in zip((row.px, row.py, row.pz), shp))
            acc[sl] += np.frombuffer(row.payload, dtype=np.float64).reshape(shp)
        print(f"[asm pid={os.getpid()}] key={key} rows={len(pdf)} "
              f"compute={time.monotonic()-t0:.2f}", file=sys.stderr, flush=True)
        return pd.DataFrame(
            [(key[0], key[1], key[2], acc.tobytes())],
            columns=["bx", "by", "bz", "data"])

    out = frags.groupBy("tbx", "tby", "tbz").applyInPandas(assemble, BLOCK_SCHEMA)
    for i in range(3):
        t0 = time.time()
        n = out.count()
        print(f"== pass {i}: {time.time()-t0:.2f}s (n={n}) ==",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
