"""Stage-level timing for q_corpus_curate's superlinear-probe flag
(round-7 VERDICT item 2): times the pipeline's three cumulative
prefixes at sf0.1 and the 10x fixture so the growth ratio can be
attributed to a stage instead of re-litigated as noise each round.

  S1 clean      — scan + the two regexp_replace passes (narrow)
  S2 +hash      — S1 + length/token filters + md5(clean) (narrow;
                  everything that runs BEFORE the one exchange)
  S3 full       — S2 + the thin row_number window + hash sample
                  (adds the single (h, ids) shuffle)

Usage: python tools/curate_stage_timing.py [reps]
Prints one JSON line: per-stage min-of-N seconds at both scales and
the per-stage growth ratios.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from bench import run_full  # noqa: E402
from engine.io import load_tables  # noqa: E402
from engine.queries.util import hexpoly_sql  # noqa: E402
from engine.session import get_spark  # noqa: E402


def stages(spark, sf):
    d = load_tables(spark, sf)["documents"]
    clean = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "))
    cleaned = d.select("doc_id", "lang", "source", clean.alias("clean"))
    scored = (
        cleaned.filter(F.length("clean") >= 50)
        .withColumn("n_tokens", F.size(F.split("clean", " ")))
        .filter(F.col("n_tokens") >= 10)
        .select("doc_id", "lang", "source", "n_tokens",
                F.md5(F.col("clean").cast("binary")).alias("h"))
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    hs = F.expr(hexpoly_sql("md5(concat(doc_id, '#curate'))"))
    full = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter((hs % 100) < 30)
        .select("doc_id", "lang", "source",
                F.col("n_tokens").cast("long").alias("n_tokens"))
    )
    return {"s1_clean": cleaned, "s2_hash": scored, "s3_full": full}


def _check_sync(spark, sf) -> None:
    """The stage prefixes above re-state q_corpus_curate's pipeline
    inline (the prefixes don't exist as separable DataFrames in the
    operator). Guard against silent desync (round-8 ADVICE.md): the
    full prefix must produce exactly the registered operator's rows,
    or the stage attribution this tool exists for is attributing the
    wrong pipeline."""
    from engine import registry

    registry.load_all()
    n_tool = stages(spark, sf)["s3_full"].count()
    n_op = registry.QUERIES["q_corpus_curate"](spark, sf).count()
    if n_tool != n_op:
        raise SystemExit(
            f"stage pipeline desynced from q_corpus_curate at {sf}: "
            f"s3_full={n_tool} rows vs operator={n_op} — update "
            f"stages() to match engine/queries/pipeline.py")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("curate_stage_timing")
    _check_sync(spark, "/root/testdata/sf0.1")
    out: dict[str, dict[str, float]] = {}
    for label, sf in (("sf0.1", "/root/testdata/sf0.1"),
                      ("x10", "/tmp/engine_scale_x10")):
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(f"missing fixture {sf}; run scale_probe.py --rebuild",
                  file=sys.stderr)
            return
        row: dict[str, float] = {}
        for name, df in stages(spark, sf).items():
            run_full(df)  # warm (JIT + page cache), untimed
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                run_full(df)
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 3)
        out[label] = row
    growth = {k: round(out["x10"][k] / out["sf0.1"][k], 2)
              for k in out["sf0.1"] if out["sf0.1"][k] > 0}
    print(json.dumps({"stages": out, "growth_10x": growth,
                      "reps": reps}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
