"""Hypothesis properties for the round-12 shared kernels, driven on
GENERATED data (not the fixtures) so they cover shapes the fixtures
never produce:

- _band_structs_rowlocal (the stateless stream side of the near-dup
  gate) must emit byte-identical band hashes to the batch
  shingle→signature→band pipeline for ARBITRARY texts — including
  docs under 3 words, repeated words, and single-character words.
- the q_mix_schedule epoch construction (full passes + md5-grid tail)
  must reproduce a Python replay for ARBITRARY (full_epochs,
  tail_ppm) planner rows — including full_epochs = 0 (the Spark
  sequence(0,-1) footgun the engine guards with when()).
"""
from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

WORD = st.text(alphabet="abcde", min_size=1, max_size=5)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.lists(WORD, min_size=0, max_size=9),
                min_size=1, max_size=10))
def test_rowlocal_bands_equal_batch_pipeline(spark, docs):
    """Row-local band hashes == the batch explode→groupBy→band path
    on arbitrary texts (the certification behind the streaming
    near-dup twin's determinism claim)."""
    from engine.queries.llm import (
        _band_frame, _band_structs_rowlocal, _minhash_signatures,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    local = {
        (r["doc_id"], r["b"]["band_id"], r["b"]["bh"])
        for r in d.select(
            "doc_id",
            F.explode(_band_structs_rowlocal(F.col("text")))
            .alias("b")).collect()
    }

    # batch path: the _shingle_hashes transform inlined on the same
    # frame (the registered helper reads from parquet fixtures)
    ws = F.split("text", " ")
    tri = F.transform(
        F.sequence(F.lit(0), F.size(ws) - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2),
            F.element_at(ws, i + 3)))
    hv = (d.filter(F.size(ws) >= 3)
          .select("doc_id", F.explode(tri).alias("s"))
          .select("doc_id",
                  F.conv(F.substring(
                      F.md5(F.col("s").cast("binary")), 1, 8), 16, 10)
                  .cast("long").alias("h")))
    batch = {
        (r["doc_id"], r["band_id"], r["bh"])
        for r in _band_frame(_minhash_signatures(hv), 4, 2).collect()
    }
    assert local == batch


def _hexpoly(md5hex: str) -> int:
    return int(md5hex[:8], 16)


@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 4),            # full_epochs
              st.integers(0, 1_000_000),    # tail_ppm
              st.integers(1, 40)),          # docs in this source
    min_size=1, max_size=5))
def test_mix_epoch_construction_matches_python(spark, plan):
    """The epochs-array construction (full passes concat conditional
    tail) on ARBITRARY planner rows — including full_epochs = 0,
    tail_ppm = 0, and tail_ppm = 1e6 — equals the Python replay.
    Guards the sequence(0, -1) footgun: Spark's sequence yields
    [0, -1] for an empty range, so the when() guard is
    correctness-bearing, not style."""
    docs = []
    doc_id = 0
    for s, (fe, ppm, ndocs) in enumerate(plan):
        for _ in range(ndocs):
            docs.append((doc_id, f"s{s}", fe, ppm))
            doc_id += 1
    d = spark.createDataFrame(
        docs, "doc_id long, source string, full_epochs long, "
              "tail_ppm long")

    from engine.queries.util import hexpoly_sql
    empty = F.array().cast("array<bigint>")
    keep_tail = (
        F.expr(hexpoly_sql("md5(concat(doc_id, '#mix'))")) % 1000000
        < F.col("tail_ppm"))
    epochs = F.concat(
        F.when(F.col("full_epochs") > 0,
               F.sequence(F.lit(0).cast("long"),
                          F.col("full_epochs") - 1)).otherwise(empty),
        F.when(keep_tail, F.array(F.col("full_epochs")))
         .otherwise(empty))
    got = {(r["doc_id"], r["epoch"]) for r in
           d.select("doc_id", F.explode(epochs).alias("epoch"))
           .collect()}

    want = set()
    for doc, src, fe, ppm in docs:
        for e in range(fe):
            want.add((doc, e))
        u = _hexpoly(hashlib.md5(f"{doc}#mix".encode()).hexdigest())
        if u % 1_000_000 < ppm:
            want.add((doc, fe))
    assert got == want


# ---------------------------------------------------------------
# round-12 second-session kernels: the stride-interleave closed form
# and the pack-mask span arithmetic, both validated on GENERATED
# configurations (ties, exhausted sources, single-source, boundary
# docs) the committed fixtures never produce. Pure integer math —
# the Spark expressions mirror these formulas textually and are
# fixture-replay-pinned in tests/test_plans_r12.py.


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 50),      # weight w_s
                          st.integers(0, 12)),     # stream length n_s
                min_size=1, max_size=6))
def test_stride_rank_closed_form_matches_fraction_replay(cfg):
    """rank(s, p) = Σ_t min(floor((w_t(2p-1) + w_s) / (2 w_s)), n_t)
    must equal |{picks q of any source with v_t(q) <= v_s(p)}| under
    exact rational arithmetic — including all-equal weights (every
    pick tied across sources), sources with zero docs, and sources
    exhausted mid-schedule (the cap term)."""
    from bisect import bisect_right
    from fractions import Fraction

    picks = [Fraction(2 * p - 1, 2 * w)
             for w, n in cfg for p in range(1, n + 1)]
    picks.sort()
    for w_s, n_s in cfg:
        for p in range(1, n_s + 1):
            rank = sum(min((w_t * (2 * p - 1) + w_s) // (2 * w_s), n_t)
                       for w_t, n_t in cfg)
            v = Fraction(2 * p - 1, 2 * w_s)
            assert rank == bisect_right(picks, v), (cfg, w_s, p)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(1, 30), min_size=1, max_size=20),
       st.integers(2, 16))
def test_pack_mask_span_arithmetic_matches_token_walk(lens, k):
    """The per-(seq) fill / doc-count / boundary flags derived from
    the manifest formula (fill = min((s+1)K, cum) - max(sK, cum -
    n_tok), begins_mid = cum - n_tok < sK, ends_mid = cum > (s+1)K)
    must equal a brute-force walk that assigns every token of the
    concatenated stream to its (sequence, doc) cell — one shard, the
    shard-local construction q_pack_sequences/q_pack_mask_spans
    share."""
    from collections import Counter, defaultdict

    # manifest formula lane
    cum = 0
    cells = Counter()          # (seq) -> fill via formula
    docs_in = defaultdict(set)
    begins, ends = {}, {}
    for i, n in enumerate(lens):
        cum += n
        start, end = (cum - n) // k, (cum - 1) // k
        for s in range(start, end + 1):
            fill = min((s + 1) * k, cum) - max(s * k, cum - n)
            cells[s] += fill
            docs_in[s].add(i)
            begins[s] = begins.get(s, False) or (cum - n < s * k)
            ends[s] = ends.get(s, False) or (cum > (s + 1) * k)
    # brute token walk
    walk = Counter()
    wdocs = defaultdict(set)
    pos = 0
    for i, n in enumerate(lens):
        for _ in range(n):
            walk[pos // k] += 1
            wdocs[pos // k].add(i)
            pos += 1
    assert cells == walk
    assert docs_in == wdocs
    for s in cells:
        first_tok_doc_started_before = any(
            sum(lens[:d]) < s * k for d in wdocs[s])
        assert begins[s] == first_tok_doc_started_before, (lens, k, s)
        last_doc_continues = any(
            sum(lens[:d + 1]) > (s + 1) * k for d in wdocs[s])
        assert ends[s] == last_doc_continues, (lens, k, s)


# half-integer grid: all dots/norms exact in float64, so the chunked
# pipeline, the replay and any summation order agree bit-for-bit —
# the property isolates CHUNKING/TIE machinery, not float noise
_VEC = st.lists(st.sampled_from([-1.0, -0.5, 0.5, 1.0, 2.0]),
                min_size=4, max_size=4)


@settings(max_examples=10, deadline=None)
@given(st.lists(_VEC, min_size=2, max_size=28, unique_by=tuple),
       st.integers(2, 5))
def test_chunked_cos_topk_equals_brute_force(spark, vecs, chunks):
    """The chunked-GEMM top-20 must equal a single brute-force pass
    under the engine's exact semantics (1e-4-quantized cosine,
    global (-cos, v1, v2) order, top-20) for ARBITRARY vector sets
    and ANY forced chunk count — including duplicate-direction
    vectors (cos exactly 1.0 ties at the cut boundary), the case the
    margin-preselect + tie-aware per-group cut exists for. Grid
    values keep every dot/norm exact in float64, so any mismatch is
    chunking logic, never summation order."""
    import math

    from engine.queries.llm import _chunked_cos_topk_frame

    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = [(r["v1"], r["v2"], r["cos_sim"]) for r in
           _chunked_cos_topk_frame(spark, d, len(vecs), 4,
                                   chunks=chunks).collect()]
    brute = []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            dot = sum(a * b for a, b in zip(vecs[i], vecs[j]))
            na = math.sqrt(sum(a * a for a in vecs[i]))
            nb = math.sqrt(sum(b * b for b in vecs[j]))
            cs = math.floor(dot / (na * nb) * 10000 + 0.5) / 10000
            brute.append((i, j, cs))
    brute.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert got == brute[:20]
