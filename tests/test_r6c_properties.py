"""Property/consistency pins for the round-6 final-wave operators —
each verified against an independent local recomputation (numpy /
brute-force Python), not just the DuckDB oracle, so a matching
engine+oracle mistake cannot slip through both gates.
"""
from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from engine.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def test_dedup_paragraph_matches_bruteforce(spark):
    """Chunk counts and duplicate flags must equal a pure-Python
    re-chunking: 20-word windows, a chunk is duplicated iff its
    exact text appears in >= 2 distinct documents."""
    rows = {r.doc_id: r for r in
            QUERIES["q_dedup_paragraph"](spark, SF).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"WHERE length(text) > 0").fetchall()
    chunks: dict[int, list[str]] = {}
    owners: dict[str, set[int]] = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        cs = [" ".join(ws[i:i + 20]) for i in range(0, len(ws), 20)]
        chunks[doc_id] = cs
        for c in cs:
            owners.setdefault(c, set()).add(doc_id)
    assert set(rows) == set(chunks)
    for doc_id, cs in chunks.items():
        r = rows[doc_id]
        n_dup = sum(1 for c in cs if len(owners[c]) >= 2)
        assert r.n_chunks == len(cs)
        assert r.n_dup_chunks == n_dup
        assert r.dup_ratio == pytest.approx(n_dup / len(cs), abs=1e-4)
    # fixture sanity: the duplicate signal is non-degenerate
    assert any(r.n_dup_chunks > 0 for r in rows.values())


def test_zipf_fit_matches_polyfit(spark):
    """Slope/intercept/r2 must match an independent numpy OLS on the
    same top-100 ln-ln points, and the slope must be negative (a
    frequency-ranked curve always decays)."""
    row = QUERIES["q_zipf_fit"](spark, SF).collect()[0]
    toks = duckdb.sql(
        f"SELECT w, count(*) AS f FROM (SELECT unnest(string_split(text,' ')) AS w "
        f"FROM '{SF}/documents.parquet' WHERE length(text) > 0) "
        f"GROUP BY w ORDER BY f DESC, w LIMIT 100").fetchall()
    x = np.log(np.arange(1, len(toks) + 1, dtype=np.float64))
    y = np.log(np.array([f for _, f in toks], dtype=np.float64))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.n_top == len(toks)
    assert row.slope == pytest.approx(slope, abs=2e-3)
    assert row.intercept == pytest.approx(intercept, abs=2e-3)
    assert row.r2 == pytest.approx(r * r, abs=2e-3)
    assert row.slope < 0


def test_skyline_matches_bruteforce(spark):
    """The window-sweep skyline must equal the O(n^2) dominance
    definition exactly, per brand."""
    got = {r.p_partkey for r in QUERIES["q_skyline"](spark, SF).collect()}
    parts = duckdb.sql(
        f"SELECT p_partkey, p_brand, p_retailprice, p_size "
        f"FROM '{SF}/part.parquet'").fetchall()
    by_brand: dict[str, list] = {}
    for k, b, pr, sz in parts:
        by_brand.setdefault(b, []).append((k, pr, sz))
    want = set()
    for rows in by_brand.values():
        for k, pr, sz in rows:
            dominated = any(
                qpr <= pr and qsz >= sz and (qpr < pr or qsz > sz)
                for _, qpr, qsz in rows)
            if not dominated:
                want.add(k)
    assert got == want
    assert want  # non-degenerate


def test_ab_welch_matches_numpy(spark):
    """t statistic and Welch dof must match a from-scratch numpy
    computation on the raw per-hour samples (tolerance covers the
    engine's 1e-4 moment quantization)."""
    rows = {r.hr: r for r in QUERIES["q_ab_welch"](spark, SF).collect()}
    raw = duckdb.sql(
        f"SELECT CAST(hour(ts) AS INT), event_type, value "
        f"FROM '{SF}/events.parquet' "
        f"WHERE event_type IN ('click','view')").fetchall()
    per_hr: dict[int, dict[str, list[float]]] = {}
    for hr, et, v in raw:
        per_hr.setdefault(hr, {"click": [], "view": []})[et].append(v)
    assert rows
    for hr, r in rows.items():
        a = np.array(per_hr[hr]["click"])
        b = np.array(per_hr[hr]["view"])
        assert r.n1 == len(a) and r.n2 == len(b)
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        dof = se2 ** 2 / ((v1 / len(a)) ** 2 / (len(a) - 1)
                          + (v2 / len(b)) ** 2 / (len(b) - 1))
        assert r.t_stat == pytest.approx(t, abs=5e-3)
        assert r.dof == pytest.approx(dof, abs=0.5)
        assert min(len(a), len(b)) - 1 <= r.dof <= len(a) + len(b) - 2


def test_ts_seasonal_matches_numpy(spark):
    """Hourly means and the ANOVA strength ratio must match numpy;
    strength must lie in [0, 1] (it is SS_between / SS_total)."""
    rows = [r for r in QUERIES["q_ts_seasonal"](spark, SF).collect()]
    raw = duckdb.sql(
        f"SELECT event_type, CAST(hour(ts) AS INT), value "
        f"FROM '{SF}/events.parquet'").fetchall()
    per_type: dict[str, dict[int, list[float]]] = {}
    for et, hr, v in raw:
        per_type.setdefault(et, {}).setdefault(hr, []).append(v)
    assert rows
    for r in rows:
        hrs = per_type[r.event_type]
        xs = np.array(hrs[r.hr])
        allv = np.concatenate([np.array(v) for v in hrs.values()])
        assert r.n_h == len(xs)
        assert r.hour_mean == pytest.approx(xs.mean(), abs=5e-4)
        assert r.grand_mean == pytest.approx(allv.mean(), abs=5e-4)
        assert r.dev == pytest.approx(xs.mean() - allv.mean(), abs=1e-3)
        m = allv.mean()
        ss_b = sum(len(v) * (np.mean(v) - m) ** 2 for v in hrs.values())
        ss_t = ((allv - m) ** 2).sum()
        assert r.strength == pytest.approx(ss_b / ss_t, abs=1e-3)
        assert -1e-9 <= r.strength <= 1 + 1e-9
