"""Structured Streaming smoke (FIXTURES.md B5): file-source replay of
events through the tumbling-window agg with a 10-minute watermark.
Asserts (a) every append-mode emitted window matches the batch
analogue and (b) a 2-hour-late replayed tail changes nothing.
"""
import tempfile

from engine.streaming import run_replay, streaming_dedup, read_event_stream


def test_streaming_matches_batch_and_drops_late(spark, sf_dir):
    with tempfile.TemporaryDirectory() as wd:
        res = run_replay(spark, sf_dir, wd, query_name="t_stream")
        streamed = {
            (r.ws_us, r.event_type): (r.n, round(r.sum_value, 6))
            for r in res["streamed"].collect()
        }
        batch = {
            (r.ws_us, r.event_type): (r.n, round(r.sum_value, 6))
            for r in res["batch"].collect()
        }
        assert res["n_before"] > 0
        # append mode emits only watermark-finalized windows: subset,
        # and every emitted window agrees exactly with batch
        assert set(streamed) <= set(batch)
        for k, v in streamed.items():
            assert batch[k] == v
        # late tail (2h behind watermark) must not add or change rows
        assert res["n_after_late"] == res["n_before"]


def test_streaming_dedup_within_watermark(spark, sf_dir):
    with tempfile.TemporaryDirectory() as wd:
        src = f"{wd}/src"
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        dup = raw.limit(50)
        dup.union(dup).repartition(4).write.mode("overwrite").parquet(src)
        q = (
            streaming_dedup(read_event_stream(spark, src))
            .writeStream.outputMode("append")
            .format("memory").queryName("t_dedup").start()
        )
        q.processAllAvailable()
        n = spark.sql("SELECT count(DISTINCT event_id) FROM t_dedup").collect()[0][0]
        total = spark.sql("SELECT count(*) FROM t_dedup").collect()[0][0]
        q.stop()
        assert n == 50
        assert total == 50  # duplicates suppressed within the watermark
