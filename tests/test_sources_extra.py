"""Engine-side pins for the text source and the compaction op:
the tab-framed text round trip preserves every record, and the
compaction rewrite actually reduces the file count.
"""
from __future__ import annotations

import os

from engine.io import session_cache
from engine.registry import QUERIES, load_all

load_all()


def test_text_source_preserves_every_record(spark, sf_dir):
    from engine.io import load_tables

    out = QUERIES["q_source_text"](spark, sf_dir)
    n = out.agg({"n": "sum"}).collect()[0][0]
    assert n == load_tables(spark, sf_dir)["documents"].count()


def test_compaction_reduces_file_count(spark, sf_dir):
    QUERIES["q_compaction"](spark, sf_dir).collect()
    comp = session_cache(spark, "_engine_source_cache")[
        (sf_dir.rstrip("/"), "compact")]
    frag = comp.replace("engine_compact_", "engine_frag_")
    n_frag = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    n_comp = sum(1 for f in os.listdir(comp) if f.endswith(".parquet"))
    assert n_frag == 64
    assert n_comp < n_frag / 8  # size-targeted: far fewer files
