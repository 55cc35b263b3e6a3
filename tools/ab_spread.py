"""Same-session A/B of engine.io.spread (round 15, batch 2).

The sandbox's regime drift (2-4x uniform swings within an hour,
BASELINE.md) makes cross-session before/after timing unreliable, so
this harness toggles spread between identity (arm A) and the real
round-robin floor (arm B) INSIDE one warm JVM, alternating A/B per
repetition — regime drift hits both arms equally and the comparison
survives it. One untimed warm-up per arm pays codegen compilation.

Usage: python tools/ab_spread.py q_text_stats q_cluster_kmeans ... [-n 4]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = 4
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
        args = [a for a in args if a != str(n)]

    from bench import run_full
    import engine.io as io
    from engine.io import load_tables
    from engine.registry import QUERIES, load_all
    from engine.session import get_spark

    real_spread = io.spread
    spark = get_spark("ab_spread")
    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t = load_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "events", "documents",
                 "embeddings"):
        t[name].cache().count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    # patch every query module that imported spread by name
    import engine.queries as Q
    mods = [io] + [getattr(Q, m) for m in dir(Q) if not m.startswith("_")
                   and hasattr(getattr(Q, m), "spread")]

    def set_spread(fn):
        io.spread = fn
        for m in mods:
            m.spread = fn

    unknown = [k for k in args if k not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    for key in args:
        fn = QUERIES[key]
        a_runs, b_runs = [], []
        for mode_fn in (lambda d: d, real_spread):  # warm-up per arm
            set_spread(mode_fn)
            run_full(fn(spark, sf_dir))
        for _ in range(n):
            set_spread(lambda d: d)
            t0 = time.time()
            run_full(fn(spark, sf_dir))
            a_runs.append(round(time.time() - t0, 3))
            set_spread(real_spread)
            t0 = time.time()
            run_full(fn(spark, sf_dir))
            b_runs.append(round(time.time() - t0, 3))
        set_spread(real_spread)
        print(json.dumps({key: {
            "no_spread": {"runs": a_runs, "min": min(a_runs),
                          "median": round(statistics.median(a_runs), 3)},
            "spread": {"runs": b_runs, "min": min(b_runs),
                       "median": round(statistics.median(b_runs), 3)},
        }}), flush=True)


if __name__ == "__main__":
    main()
