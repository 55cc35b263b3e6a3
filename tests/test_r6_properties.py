"""Property/consistency pins for the round-6 wave-3 operators —
each verified against an independent local recomputation (numpy /
brute-force Python), not just the DuckDB oracle, so a matching
engine+oracle mistake cannot slip through both gates.
"""
from __future__ import annotations

import numpy as np
import pytest

from engine.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def test_weighted_quantile_matches_bruteforce(spark):
    """The discrete weighted quantile must equal a brute-force
    expansion: repeat each value by its integer weight, sort, and
    take the ceil-indexed element."""
    rows = QUERIES["q_weighted_quantile"](spark, SF).collect()
    import duckdb

    raw = duckdb.sql(
        f"SELECT l_returnflag, l_extendedprice, l_quantity "
        f"FROM '{SF}/lineitem.parquet'").fetchall()
    groups: dict[str, list] = {}
    for flag, v, w in raw:
        groups.setdefault(flag, []).append((float(v), int(w)))

    def brute(pairs, p):
        # smallest v with cumweight*denom >= total*num
        vals = sorted(pairs)
        total = sum(w for _, w in vals)
        cum = 0
        for v, w in vals:
            cum += w
            if cum >= p * total:
                return v
        raise AssertionError

    assert rows
    for r in rows:
        pairs = groups[r.l_returnflag]
        assert r.w_p25 == pytest.approx(brute(pairs, 0.25))
        assert r.w_median == pytest.approx(brute(pairs, 0.5))
        assert r.w_p75 == pytest.approx(brute(pairs, 0.75))
        assert r.w_p25 <= r.w_median <= r.w_p75


def test_basket_rules_metric_consistency(spark):
    """support/confidence/lift must be mutually consistent with the
    integer counts they derive from, and bounded sanely."""
    rows = QUERIES["q_basket_rules"](spark, SF).collect()
    assert rows
    import duckdb

    n_orders, = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet'").fetchone()
    for r in rows:
        assert r.p1 < r.p2
        assert r.n_both >= 2
        assert r.n_both <= min(r.n_p1, r.n_p2)
        assert r.support == pytest.approx(
            np.floor(r.n_both / n_orders * 1e6 + 0.5) / 1e6)
        assert r.confidence == pytest.approx(
            np.floor(r.n_both / r.n_p1 * 1e6 + 0.5) / 1e6)
        assert r.lift == pytest.approx(
            np.floor(r.n_both * n_orders / (r.n_p1 * r.n_p2) * 1e6
                     + 0.5) / 1e6)
        assert 0 < r.confidence <= 1


def test_attribution_matches_bruteforce(spark):
    """Every purchase credit must match a per-user sequential replay
    of the event log (first/last preceding view-or-click)."""
    rows = {r.purchase_id: (r.last_touch_id, r.first_touch_id)
            for r in QUERIES["q_attribution"](spark, SF).collect()}
    import duckdb

    log = duckdb.sql(
        f"SELECT user_id, event_id, event_type, ts "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, eid, et, ts in log:
        by_user.setdefault(u, []).append((eid, et))
    checked = 0
    for u, evs in by_user.items():
        first = last = None
        for eid, et in evs:
            if et == "purchase":
                if last is not None:
                    assert rows[eid] == (last, first), (u, eid)
                    checked += 1
                else:
                    assert eid not in rows
            if et in ("view", "click"):
                if first is None:
                    first = eid
                last = eid
    assert checked > 50  # the hit path is genuinely exercised


def test_autocorr_matches_numpy(spark):
    """acf1 must equal numpy's Pearson correlation of the quantized
    lagged series, and lie in [-1, 1]."""
    rows = QUERIES["q_ts_autocorr"](spark, SF).collect()
    import duckdb

    assert rows
    for r in rows:
        assert -1.0 <= r.acf1 <= 1.0
        series = [v for (v,) in duckdb.sql(
            f"SELECT value FROM '{SF}/events.parquet' "
            f"WHERE event_type = '{r.event_type}' "
            f"ORDER BY ts, event_id").fetchall()]
        x = np.floor(np.array(series) * 1e4 + 0.5)
        want = np.corrcoef(x[1:], x[:-1])[0, 1]
        assert r.acf1 == pytest.approx(
            np.floor(want * 1e6 + 0.5) / 1e6, abs=2e-6)
        assert r.n_pairs == len(x) - 1


def test_containment_bounds_and_exactness(spark):
    """Containment must be within (0, 1] and n_shared bounded by the
    smaller shingle set; spot-check one pair against recomputed
    shingle sets."""
    rows = QUERIES["q_dedup_containment"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_shared <= min(r.n1, r.n2)
        assert 0 < r.containment <= 1.0
    # spot-check the highest-containment pair exactly
    top = max(rows, key=lambda r: (r.containment, -r.d1))
    import duckdb

    def shingles(doc_id):
        text, = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet' "
            f"WHERE doc_id = {doc_id}").fetchone()
        ws = text.split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    s1, s2 = shingles(top.d1), shingles(top.d2)
    assert top.n_shared == len(s1 & s2)
    assert top.n1 == len(s1) and top.n2 == len(s2)
