"""Multimodal-column query keys: binary payload metadata extraction.

The heavy path (Arrow mapInPandas feature extraction with the stubbed
codec) lives in engine/multimodal.py and is asserted against this
oracle-checked metadata query in tests.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..multimodal import attach_payload, resize_pool, sample_frames
from ..registry import query


@query("q_multimodal_meta", oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ascii(text) AS first_cp,
       CAST(list_sum(list_transform(string_split_regex(text, ''),
                c -> ascii(c))) AS BIGINT) AS checksum
FROM documents
""")
def q_multimodal_meta(spark, sf):
    d = load_tables(spark, sf)["documents"]
    p = attach_payload(d)
    checksum = F.aggregate(
        F.split(F.col("text"), ""), F.lit(0).cast("long"),
        lambda acc, c: acc + F.ascii(c))
    meta = d.select("doc_id", F.ascii("text").alias("first_cp"),
                    checksum.alias("checksum"))
    return (
        p.join(meta, "doc_id")
        .select("doc_id", "n_bytes", "first_cp", "checksum")
    )


@query("q_multimodal_frames", oracle="""
WITH f AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, (octet_length(encode(text)) - 1) // 32)) AS frame_id
    FROM documents WHERE octet_length(encode(text)) > 0)
SELECT doc_id, frame_id,
       frame_id * 32 AS off,
       octet_length(encode(substr(text, frame_id * 32 + 1, 48)))
           AS frame_bytes,
       CAST(list_sum(list_transform(
           string_split_regex(substr(text, frame_id * 32 + 1, 48), ''),
           c -> ascii(c))) AS BIGINT) AS checksum
FROM f
""")
def q_multimodal_frames(spark, sf):
    """Frame sampling over the binary payload column (the video
    frame-sample pattern: 48-byte windows every 32 bytes, overlapping,
    last frame truncated) with a deterministic per-frame byte-sum
    standing in for the decoder. The Spark side slices real binary
    buffers under mapInPandas; the oracle replays the same windows via
    text positions, which equals byte offsets because the fixture
    corpus is ASCII (asserted by q_multimodal_meta's per-char ascii
    checksum hash-matching octet sums)."""
    d = load_tables(spark, sf)["documents"]
    return sample_frames(attach_payload(d), frame_bytes=48, stride=32)


@query("q_multimodal_resize", oracle="""
WITH n AS (SELECT doc_id, text, octet_length(encode(text)) AS n
           FROM documents WHERE octet_length(encode(text)) >= 16),
b AS (SELECT doc_id, text, n, unnest(range(0, 16)) AS bucket FROM n)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(list_sum(list_transform(
           string_split_regex(substr(text,
               (bucket * n) // 16 + 1,
               ((bucket + 1) * n) // 16 - (bucket * n) // 16), ''),
           c -> ascii(c))) AS BIGINT) AS pooled
FROM b
""")
def q_multimodal_resize(spark, sf):
    """The resize/downsample step of the multimodal pipeline: each
    payload pooled into 16 fixed buckets of exact byte sums (the 1-D
    analogue of image resizing on the stubbed decode — see
    engine/multimodal.py:resize_pool). The oracle replays the same
    integer bucket boundaries over character positions, valid because
    the fixture corpus is ASCII (byte offset ≡ char offset, pinned by
    q_multimodal_meta)."""
    d = load_tables(spark, sf)["documents"]
    return resize_pool(attach_payload(d), buckets=16)
