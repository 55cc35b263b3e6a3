"""Cold-JVM per-key A/B (round 16, VERDICT items 3/5): run one or
more registry keys exactly the way bench.py does (same warm-up caches,
same noop-sink action, min-of-N), in a FRESH JVM, with optional
RUNTIME_CONFS overrides — so two invocations isolate one config or
one formulation the way the driver measures (cold start), not the way
a warm-session probe does.

Usage:
  python tools/ab_key.py q_kruskal_wallis q_levene_test \
      [--conf spark.x.y=z] [--conf spark.x.w=] [--runs 3]

An empty value removes the conf from RUNTIME_CONFS (falls back to the
Spark default).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys: list[str] = []
    overrides: dict[str, str | None] = {}
    runs = 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--conf":
            k, _, v = args[i + 1].partition("=")
            overrides[k] = v or None
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            keys.append(a)
            i += 1

    import engine.session as sess
    for k, v in overrides.items():
        if v is None:
            sess.RUNTIME_CONFS.pop(k, None)
        else:
            sess.RUNTIME_CONFS[k] = v

    from engine.io import load_tables
    from engine.registry import QUERIES, load_all
    from bench import run_full

    spark = sess.get_spark("ab_key")
    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t = load_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        t[name].cache().count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    for k, v in overrides.items():
        try:
            print(f"conf {k} = {spark.conf.get(k)}", flush=True)
        except Exception:
            print(f"conf {k} = <default>", flush=True)
    for key in keys:
        fn = QUERIES[key]
        times = []
        for _ in range(runs):
            t0 = time.time()
            run_full(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        print(f"RESULT {key}: {times} min={min(times):.3f}", flush=True)


if __name__ == "__main__":
    main()
