"""Multimodal-column query keys: binary payload metadata extraction.

The heavy path (Arrow mapInPandas feature extraction with the stubbed
codec) lives in engine/multimodal.py and is asserted against this
oracle-checked metadata query in tests.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_tables
from ..multimodal import attach_payload
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
