"""Multimodal binary plumbing + sinks + events-timestamp repair."""
import tempfile

import pytest
from pyspark.sql import functions as F

from engine.io import load_tables, write_csv, write_parquet
from engine.multimodal import attach_payload, decode_real, extract_features


def test_multimodal_features_match_sql_checksum(spark, sf_dir):
    d = load_tables(spark, sf_dir)["documents"]
    feats = extract_features(attach_payload(d)).collect()
    sql_side = {
        r.doc_id: (r.n_bytes, r.checksum)
        for r in spark.sql(
            "SELECT doc_id, octet_length(encode(text, 'utf-8')) AS n_bytes, "
            "aggregate(split(text, ''), 0L, (a, c) -> a + ascii(c)) AS checksum "
            "FROM documents").collect()
    }
    assert len(feats) == len(sql_side)
    for r in feats:
        n_bytes, checksum = sql_side[r.doc_id]
        assert r.n_bytes == n_bytes
        assert r.checksum == checksum  # ASCII corpus: byte sum == codepoint sum
        assert len(r.feat) == 8


def test_decode_stub_is_marked():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")


def test_sinks_roundtrip(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    df = t["region"].select("r_regionkey", "r_name")
    with tempfile.TemporaryDirectory() as wd:
        write_parquet(df, f"{wd}/p")
        assert spark.read.parquet(f"{wd}/p").count() == 5
        write_csv(df, f"{wd}/c")
        back = spark.read.option("header", "true").csv(f"{wd}/c")
        assert back.count() == 5 and back.columns == ["r_regionkey", "r_name"]


def test_events_ts_rebuilt_to_microseconds(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert lo.year == 2024 and hi.year == 2024
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_resize_pool_conserves_checksum(spark, sf_dir):
    """The 16 pooled bucket sums of a payload must add back up to the
    full byte-sum checksum — the pooling partitions the buffer."""
    from engine.multimodal import attach_payload, extract_features, resize_pool

    t = load_tables(spark, sf_dir)
    p = attach_payload(t["documents"])
    totals = {r.doc_id: r.checksum for r in extract_features(p).collect()}
    pooled = resize_pool(p, buckets=16).groupBy("doc_id").agg(
        F.sum("pooled").alias("s"), F.count(F.lit(1)).alias("nb")).collect()
    assert pooled, "no payloads pooled"
    for r in pooled:
        assert r.nb == 16
        assert r.s == totals[r.doc_id]
