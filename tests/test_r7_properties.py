"""Round-7 operator property pins (chunk-grain contamination,
mergeable t-digest quantiles, IVF index refresh)."""
from __future__ import annotations

import pyspark.sql.functions as F

from engine.registry import QUERIES, load_all

load_all()


def test_contamination_chunk_semantics(spark, sf_dir):
    rows = QUERIES["q_contamination_chunk"](spark, sf_dir).collect()
    assert rows, "corpus output empty"
    # holdout docs never appear; counts bounded; ratio well-formed
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all(0 <= r.n_contam_chunks <= r.n_chunks for r in rows)
    assert all(0.0 <= r.contam_ratio <= 1.0 for r in rows)
    # non-vacuity: the sf0.01 fixture plants 4-gram collisions across
    # the holdout boundary — if a regenerated fixture loses them the
    # key silently stops testing the match path, so fail loudly here
    assert any(r.n_contam_chunks > 0 for r in rows), \
        "no contaminated chunks at sf0.01 — match path untested"
