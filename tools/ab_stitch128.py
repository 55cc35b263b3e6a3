"""Cold-JVM A/B for the 128-cube stitch bench entries (round-16,
VERDICT item 1): the driver measured stitch_block_path_128cube
2.29 -> 10.32 s and stitch_user_fn_128cube 2.63 -> 6.94 s at 32 cores
(min-of-3, three consecutive slow passes) while the 8-core lane ran
them at 2.31/2.43 s — an anti-scaling regression introduced by this
round's environment footprint, with `engine/blocks.py` untouched.

Usage:  python tools/ab_stitch128.py <variant> [--footprint]
        python tools/ab_stitch128.py --all        # fresh JVM per variant

Variants (one config toggled at a time, guide §1):
  base        RUNTIME_CONFS exactly as committed
  nocacheaqe  canChangeCachedPlanOutputPartitioning=false
  init32      initialPartitionNum removed (falls back to
              spark.sql.shuffle.partitions=32)
  bothoff     both of the above
  gclog       base + -verbose:gc on the driver JVM (diagnosis only)

--footprint approximates the driver's end-of-suite state before the
stitch entries run: the five base-table caches plus 24 persisted
~40 MB shuffled frames (the plan_persist generations the suite
leaves resident).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "nocacheaqe": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false"},
    "init32": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": None},
    "bothoff": {
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "false",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": None},
    # GC hypothesis: a 128-cube tile is a ~20 MB byte[] — far beyond
    # half a G1 region at default sizing, so every slab is a
    # humongous allocation (guide §5 memory pressure). 32 MB regions
    # make slabs regular objects.
    "g1region": {
        "spark.driver.extraJavaOptions": "-XX:G1HeapRegionSize=32m"},
    "gclog": {
        "spark.driver.extraJavaOptions":
            "-verbose:gc -Xlog:gc*:file=/tmp/stitch_gc.log"},
}


def run_variant(name: str, footprint: bool) -> None:
    import engine.session as sess

    overrides = VARIANTS[name]
    for k, v in overrides.items():
        if v is None:
            sess.RUNTIME_CONFS.pop(k, None)
        else:
            sess.RUNTIME_CONFS[k] = v
    spark = sess.get_spark(f"ab_stitch128_{name}")
    for k in overrides:
        try:
            print(f"  conf {k} = {spark.conf.get(k)}", flush=True)
        except Exception:
            print(f"  conf {k} = <unset>", flush=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if footprint:
        from pyspark.sql import functions as F

        from engine.io import load_tables
        t = load_tables(spark, sf_dir)
        for nm in ("lineitem", "orders", "events", "documents", "embeddings"):
            t[nm].cache().count()
        keep = []
        for i in range(24):
            df = (spark.range(500_000)
                  .select((F.col("id") % 9973).alias("k"),
                          F.expr("repeat(uuid(), 2)").alias("pad"))
                  .groupBy("k").agg(F.count("*").alias("n"),
                                    F.max("pad").alias("p"))
                  .persist())
            df.count()
            keep.append(df)
        print(f"  footprint: 5 cached tables + {len(keep)} persisted frames",
              flush=True)

    # warm the Python worker pool like bench.py does
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    import bench
    for label, fn in (("block", bench._bench_block_path),
                      ("userfn", bench._bench_user_fn_path)):
        times = [fn(spark) for _ in range(3)]
        print(f"  {name} {label}: {[round(x, 2) for x in times]} "
              f"min={min(times):.2f}", flush=True)


def diag(name: str) -> None:
    """Stage-split timing of the block path: tile-gen alone, tile-gen +
    fragment-emit, then the full path (emit + shuffle + reassembly),
    plus the executed plan of the full path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    import engine.session as sess
    for k, v in VARIANTS[name].items():
        if v is None:
            sess.RUNTIME_CONFS.pop(k, None)
        else:
            sess.RUNTIME_CONFS[k] = v
    spark = sess.get_spark(f"diag_stitch128_{name}")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    from engine.blocks import FRAG_SCHEMA, _weight_fn, merge_overlaps, stitch_blocks
    grid, bs, o = (2, 2, 2), (128, 128, 128), (4, 4, 4)
    ext = tuple(b + 2 * oo for b, oo in zip(bs, o))

    def mk_tiles():
        ids = spark.range(8).select(
            (F.col("id") % 2).alias("bx"),
            (F.expr("id div 2") % 2).alias("by"),
            (F.expr("id div 4") % 2).alias("bz"),
        ).repartition(8)

        def gen(batches):
            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    rng = np.random.default_rng(int(r.bx * 4 + r.by * 2 + r.bz))
                    out.append((r.bx, r.by, r.bz,
                                rng.normal(size=ext).ravel().tobytes()))
                yield pd.DataFrame(out, columns=["bx", "by", "bz", "data"])

        return ids.mapInPandas(gen, "bx long, by long, bz long, data binary")

    from itertools import product
    pre = _weight_fn(bs, o, grid)

    def emit_only(df):
        g = grid

        def emit(batches):
            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    b = (row.bx, row.by, row.bz)
                    arr = np.frombuffer(row.data, dtype=np.float64).reshape(ext)
                    arr = pre(arr, b)
                    for d in product((-1, 0, 1), repeat=3):
                        t = tuple(b[a] + d[a] for a in range(3))
                        if not all(0 <= t[a] < g[a] for a in range(3)):
                            continue
                        sl, place, shape = [], [], []
                        ok = True
                        for a in range(3):
                            lo = max(t[a] * bs[a], b[a] * bs[a] - o[a])
                            hi = min((t[a] + 1) * bs[a],
                                     b[a] * bs[a] + bs[a] + o[a])
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
                yield pd.DataFrame(
                    out, columns=["tbx", "tby", "tbz", "px", "py", "pz",
                                  "sx", "sy", "sz", "payload"])

        return df.mapInPandas(emit, FRAG_SCHEMA)

    for rep in range(3):
        t0 = time.time()
        mk_tiles().write.format("noop").mode("overwrite").save()
        t_gen = time.time() - t0
        t0 = time.time()
        emit_only(mk_tiles()).write.format("noop").mode("overwrite").save()
        t_emit = time.time() - t0
        t0 = time.time()
        n = stitch_blocks(mk_tiles(), bs, o, grid).count()
        t_full = time.time() - t0
        print(f"  rep{rep}: tilegen={t_gen:.2f}s gen+emit={t_emit:.2f}s "
              f"full={t_full:.2f}s (n={n})", flush=True)
    stitch_blocks(mk_tiles(), bs, o, grid).explain("formatted")


if __name__ == "__main__" and "--diag" in sys.argv:
    diag([a for a in sys.argv[1:] if not a.startswith("-")][0])
    sys.exit(0)


def main() -> None:
    args = sys.argv[1:]
    footprint = "--footprint" in args
    args = [a for a in args if a != "--footprint"]
    if args and args[0] == "--all":
        for v in VARIANTS:
            for fp in ([False, True] if footprint else [False]):
                cmd = [sys.executable, os.path.abspath(__file__), v]
                if fp:
                    cmd.append("--footprint")
                print(f"== {v}{' +footprint' if fp else ''} ==", flush=True)
                t0 = time.time()
                subprocess.run(cmd, check=False)
                print(f"   ({time.time() - t0:.0f}s wall)", flush=True)
        return
    run_variant(args[0] if args else "base", footprint)


if __name__ == "__main__":
    main()
