"""Per-stage task-metric diagnosis of the 128-cube block path via the
Spark UI REST API (round-16 item 1): run the bench entry a few times
with the UI on, then print where each stage's wall time went
(executor compute vs scheduler delay vs deserialize vs shuffle
fetch/write vs result fetch)."""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine.session as sess


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("diag_stitch_rest")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in sess.RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sess.configure(spark)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    import bench
    times = []
    for i in range(3):
        times.append(bench._bench_block_path(spark))
    print("block passes:", [round(t, 2) for t in times], flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    stages.sort(key=lambda s: s["stageId"])
    print(f"{'stage':>5} {'tasks':>5} {'wall_s':>7} {'run_s':>7} "
          f"{'cpu_s':>7} {'deser_s':>8} {'sched_ms':>8} {'fetch_s':>8} "
          f"{'swrite_s':>8} {'result_s':>9}  name")
    for s in stages:
        sid = s["stageId"]
        try:
            det = json.load(urllib.request.urlopen(
                f"{base}/stages/{sid}/0/taskList?length=200"))
        except Exception:
            continue
        if not det:
            continue
        run = sum(t["taskMetrics"]["executorRunTime"] for t in det
                  if t.get("taskMetrics")) / 1e3
        cpu = sum(t["taskMetrics"]["executorCpuTime"] for t in det
                  if t.get("taskMetrics")) / 1e9
        deser = sum(t["taskMetrics"]["executorDeserializeTime"] for t in det
                    if t.get("taskMetrics")) / 1e3
        sched = sum(t.get("schedulerDelay", 0) for t in det)
        fetch = sum(t["taskMetrics"].get("shuffleReadMetrics", {})
                    .get("fetchWaitTime", 0) for t in det
                    if t.get("taskMetrics")) / 1e3
        swrite = sum(t["taskMetrics"].get("shuffleWriteMetrics", {})
                     .get("writeTime", 0) for t in det
                     if t.get("taskMetrics")) / 1e9
        rget = sum(t.get("gettingResultTime", 0) for t in det) / 1e3
        wall = (s.get("completionTime") and s.get("submissionTime") and
                0.0) or 0.0
        first = min(t["launchTime"] for t in det)
        # durations
        dur = max(t.get("duration", 0) for t in det) / 1e3
        print(f"{sid:>5} {len(det):>5} {dur:>7.2f} {run:>7.2f} "
              f"{cpu:>7.2f} {deser:>8.2f} {sched:>8.0f} {fetch:>8.2f} "
              f"{swrite:>8.2f} {rget:>9.2f}  {s['name'][:40]}")


if __name__ == "__main__":
    main()
