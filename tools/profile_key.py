"""Per-key runtime + Spark job/stage/task shape profiler (round 15).

For each named key: runs the bench's full-compute noop-sink action
`reps` times in one warm session (same warm-up as bench.py) under a
per-run job group, then reports seconds (all runs + min) and, for the
LAST run, how many Spark jobs / stages / tasks it launched. At sf0.1
(600k-row lineitem) most keys are overhead-bound, so the job/stage
count is the first thing to look at: every extra job is a driver
round-trip, every extra stage a shuffle or collect.

Usage: python tools/profile_key.py [-n 3] q_rag_retrieve ...
       (keys default to the full bench HEADLINE when omitted)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = 3
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
        args = [a for a in args if a != str(n)]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE, run_full
    from engine.io import load_tables
    from engine.registry import QUERIES, load_all
    from engine.session import get_spark

    spark = get_spark("profile_key")
    load_all()
    keys = args or HEADLINE
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    t = load_tables(spark, sf_dir)
    for name in ("lineitem", "orders", "events", "documents",
                 "embeddings"):
        t[name].cache().count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for key in keys:
        fn = QUERIES[key]
        runs = []
        shape = {}
        for i in range(n):
            group = f"prof:{key}:{i}"
            sc.setJobGroup(group, key)
            t0 = time.time()
            run_full(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            shape = {"jobs": len(job_ids), "stages": n_stages,
                     "tasks": n_tasks}
        print(json.dumps({key: {"runs": runs, "min": min(runs),
                                **shape}}), flush=True)


if __name__ == "__main__":
    main()
