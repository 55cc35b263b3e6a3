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


@query("q_multimodal_audio", oracle="""
WITH w AS (
  SELECT doc_id,
         unnest([0, 1, 2, 3]) AS win,
         unnest([md5('aud#' || CAST(doc_id AS VARCHAR) || '#0'),
                 md5('aud#' || CAST(doc_id AS VARCHAR) || '#1'),
                 md5('aud#' || CAST(doc_id AS VARCHAR) || '#2'),
                 md5('aud#' || CAST(doc_id AS VARCHAR) || '#3')]) AS h
  FROM documents),
b AS (
  SELECT doc_id, win, i,
         (instr('0123456789abcdef', substr(h, 2 * i + 1, 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(h, 2 * i + 2, 1)) - 1)
             AS byte
  FROM w, unnest(range(16)) AS t(i))
SELECT doc_id, CAST(win AS INT) AS win,
       CAST(sum(byte * byte) AS BIGINT) AS energy,
       CAST(max(byte) AS BIGINT) AS peak
FROM b GROUP BY doc_id, win
""")
def q_multimodal_audio(spark, sf):
    """Audio-modality DSP path, value-checked end to end: a 64-byte
    PCM-like clip per document (synthesized deterministically —
    md5-digest bytes standing in for samples, the public-clean stand-
    in for a real decoder), windowed into four 16-sample frames, with
    per-window energy (sum of squared samples) and peak computed in
    VECTORIZED numpy over Arrow batches. Integer-exact, so the whole
    binary pipeline — JVM unhex -> Arrow transfer -> np.frombuffer ->
    per-window reduction — hash-matches an oracle that re-derives the
    same bytes from hex arithmetic.

    Scale: one narrow mapInPandas over the clip-bearing table, output
    4 rows per clip; real audio swaps the synthesizer for a codec
    read and the 16-sample window for frame-rate windows — the
    partitioning, batch shape, and reduction are unchanged. No
    shuffle anywhere (the groupBy lives inside each numpy batch)."""
    import numpy as np
    import pandas as pd

    d = load_tables(spark, sf)["documents"].select("doc_id")
    clip = F.unhex(F.concat(*[
        F.md5(F.concat(F.lit("aud#"), F.col("doc_id").cast("string"),
                       F.lit(f"#{w}")))
        for w in range(4)
    ]))
    src = d.select("doc_id", clip.alias("clip"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.frombuffer(
                b"".join(pdf["clip"]), dtype=np.uint8).astype(np.int64)
            x = raw.reshape(len(pdf), 4, 16)
            energy = (x * x).sum(axis=2)
            peak = x.max(axis=2)
            n = len(pdf)
            yield pd.DataFrame({
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), 4),
                "win": np.tile(np.arange(4, dtype=np.int32), n),
                "energy": energy.ravel(),
                "peak": peak.ravel(),
            })

    return src.mapInPandas(
        gen, "doc_id long, win int, energy long, peak long")
