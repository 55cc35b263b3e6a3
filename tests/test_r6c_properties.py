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


def test_feature_hash_matches_bruteforce(spark):
    """Bucket counts must equal a pure-Python md5-hash-mod-64
    featurization, and every token must land in [0, 64)."""
    import hashlib

    rows = QUERIES["q_feature_hash"](spark, SF).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"WHERE length(text) > 0").fetchall()
    want: dict[tuple, int] = {}
    for doc_id, text in docs:
        for w in text.split(" "):
            h = hashlib.md5(w.encode()).hexdigest()
            b = int(h[:8], 16) % 64
            want[(doc_id, b)] = want.get((doc_id, b), 0) + 1
    got = {(r.doc_id, r.bucket): r.cnt for r in rows}
    assert got == want
    assert all(0 <= b < 64 for _, b in got)


def test_gini_matches_bruteforce(spark):
    """Gini per nation must match the rank-formula computed in numpy
    on cent-quantized totals, and lie in [0, 1)."""
    rows = QUERIES["q_gini"](spark, SF).collect()
    raw = duckdb.sql(
        f"SELECT c_nationkey, o_totalprice FROM '{SF}/orders.parquet' o "
        f"JOIN '{SF}/customer.parquet' c ON o_custkey = c_custkey"
    ).fetchall()
    per_nat: dict[int, list[float]] = {}
    for nk, x in raw:
        per_nat.setdefault(nk, []).append(x)
    assert rows
    for r in rows:
        xs = np.floor(np.sort(np.array(per_nat[r.c_nationkey]))
                      * 100 + 0.5)
        n = len(xs)
        rk = np.arange(1, n + 1)
        g = 2 * (rk * xs).sum() / (n * xs.sum()) - (n + 1) / n
        assert r.n == n
        assert r.gini == pytest.approx(g, abs=1e-3)
        assert 0 <= r.gini < 1


def test_conversion_lag_matches_bruteforce(spark):
    """Quartiles of view->purchase latency must equal the sorted
    ceil-index pick over exactly the converter set."""
    row = QUERIES["q_conversion_lag"](spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) FROM "
        f"'{SF}/events.parquet' "
        f"WHERE event_type IN ('view','purchase')").fetchall()
    fv: dict[int, int] = {}
    fb: dict[int, int] = {}
    for uid, et, t in raw:
        d = fv if et == "view" else fb
        if uid not in d or t < d[uid]:
            d[uid] = t
    lags = sorted(fb[u] - fv[u] for u in fv if u in fb
                  and fb[u] >= fv[u])
    assert row.n_converted == len(lags)

    def disc(p):
        import math
        return lags[max(math.ceil(p * len(lags)), 1) - 1]

    assert row.p25_us == disc(0.25)
    assert row.p50_us == disc(0.5)
    assert row.p75_us == disc(0.75)
    assert row.p25_us <= row.p50_us <= row.p75_us


def test_time_weighted_avg_matches_bruteforce(spark):
    """TWAP per user must match a pure-Python piecewise-constant
    integral over the microsecond timeline."""
    rows = {r.user_id: r for r in
            QUERIES["q_time_weighted_avg"](spark, SF).collect()}
    raw = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), value, event_id "
        f"FROM '{SF}/events.parquet'").fetchall()
    per_user: dict[int, list] = {}
    for uid, t, v, eid in raw:
        per_user.setdefault(uid, []).append((t, eid, v))
    assert rows
    for uid, r in rows.items():
        evs = sorted(per_user[uid])
        segs = [(evs[i + 1][0] - evs[i][0],
                 np.floor(evs[i][2] * 1e4 + 0.5))
                for i in range(len(evs) - 1)]
        dur = sum(dt for dt, _ in segs)
        twap = sum(dt * vs for dt, vs in segs) / 1e4 / dur
        assert r.n_seg == len(segs)
        assert r.dur_us == dur
        assert r.twap == pytest.approx(twap, abs=1e-3)
    # users with a single event contribute no segment
    singles = {u for u, e in per_user.items() if len(e) == 1}
    assert singles.isdisjoint(rows)


def test_stream_ab_welch_matches_batch(spark):
    """The streaming complete-mode state must re-derive exactly the
    batch Welch results (same rows, same rounded statistics)."""
    batch = {r.hr: r for r in QUERIES["q_ab_welch"](spark, SF).collect()}
    stream = {r.hr: r for r in
              QUERIES["q_stream_ab_welch"](spark, SF).collect()}
    assert set(batch) == set(stream)
    for hr, b in batch.items():
        s = stream[hr]
        assert (b.n1, b.n2, b.mean_a, b.mean_b, b.t_stat, b.dof) == \
               (s.n1, s.n2, s.mean_a, s.mean_b, s.t_stat, s.dof)


def test_opq_rotation_orthonormal_and_tighter_than_pq(spark):
    """The OPQ rotation must be orthonormal (an isometry — distances
    are preserved, only the subspace split changes), and the rotated
    fit must not lose to plain PQ on total reconstruction error
    (the whole point of OPQ)."""
    import pyspark.sql.functions as F

    from engine.queries.vectors import _opq_rotation

    R = _opq_rotation(spark, SF)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-9)
    e_pq = (QUERIES["q_embed_pq"](spark, SF)
            .agg(F.sum("sq_err")).collect()[0][0])
    e_opq = (QUERIES["q_embed_opq"](spark, SF)
             .agg(F.sum("sq_err")).collect()[0][0])
    assert e_opq <= e_pq * 1.001
    # same output contract as q_embed_pq: PQ_M rows per vector,
    # codes in range
    rows = QUERIES["q_embed_opq"](spark, SF).collect()
    from engine.queries.vectors import PQ_K, PQ_M
    per_vec: dict[int, int] = {}
    for r in rows:
        per_vec[r.vec_id] = per_vec.get(r.vec_id, 0) + 1
        assert 0 <= r.code < PQ_K and 0 <= r.sub < PQ_M
        assert r.sq_err >= 0
    assert set(per_vec.values()) == {PQ_M}


def test_chi2_matches_scipy_free_computation(spark):
    """chi2 and Cramér's V must match a from-scratch numpy
    contingency computation (including empty cells)."""
    row = QUERIES["q_chi2_independence"](spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT c_mktsegment, c_nationkey FROM "
        f"'{SF}/customer.parquet'").fetchall()
    segs = sorted({s for s, _ in raw})
    nats = sorted({n for _, n in raw})
    obs = np.zeros((len(segs), len(nats)))
    for s, n in raw:
        obs[segs.index(s), nats.index(n)] += 1
    rt = obs.sum(axis=1, keepdims=True)
    ct = obs.sum(axis=0, keepdims=True)
    exp = rt @ ct / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert row.n_cells == len(segs) * len(nats)
    assert row.n == len(raw)
    assert row.dof == (len(segs) - 1) * (len(nats) - 1)
    assert row.chi2 == pytest.approx(chi2, abs=1e-2)
    v = math.sqrt(chi2 / (len(raw) * min(len(segs) - 1, len(nats) - 1)))
    assert row.cramers_v == pytest.approx(v, abs=1e-3)


def test_benford_matches_bruteforce(spark):
    """Digit counts must equal a Python first-digit scan; observed
    frequencies sum to 1 and expectations are the Benford constants."""
    rows = {r.digit: r for r in QUERIES["q_benford"](spark, SF).collect()}
    raw = [x for (x,) in duckdb.sql(
        f"SELECT o_totalprice FROM '{SF}/orders.parquet' "
        f"WHERE o_totalprice >= 1").fetchall()]
    want: dict[int, int] = {}
    for x in raw:
        d = int(str(int(x))[0])
        want[d] = want.get(d, 0) + 1
    assert {d: r.n for d, r in rows.items()} == want
    assert sum(r.obs_freq for r in rows.values()) == pytest.approx(
        1.0, abs=1e-3)
    for d, r in rows.items():
        assert r.exp_freq == pytest.approx(math.log10(1 + 1 / d), abs=1e-4)
        assert r.dev == pytest.approx(r.obs_freq - r.exp_freq, abs=2e-4)


def test_ks_matches_bruteforce(spark):
    """The KS D statistic must equal the max ECDF gap computed
    directly in numpy (exact, no tolerance beyond the 1e-6 grid)."""
    row = QUERIES["q_ks_test"](spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT l_returnflag, l_quantity FROM '{SF}/lineitem.parquet' "
        f"WHERE l_returnflag IN ('A','N')").fetchall()
    a = np.sort([v for f, v in raw if f == "A"])
    b = np.sort([v for f, v in raw if f == "N"])
    xs = np.unique(np.concatenate([a, b]))
    d = np.abs(np.searchsorted(a, xs, "right") / len(a)
               - np.searchsorted(b, xs, "right") / len(b)).max()
    assert row.n1 == len(a) and row.n2 == len(b)
    assert row.d_stat == pytest.approx(d, abs=1e-6)
    thr = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert row.reject_95 == bool(d > thr)


def test_pct_change_matches_bruteforce(spark):
    """Day-over-day percentage change must match a pandas groupby
    recomputation on quantized daily totals."""
    import datetime

    rows = QUERIES["q_pct_change"](spark, SF).collect()
    raw = duckdb.sql(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE), "
        f"value FROM '{SF}/events.parquet'").fetchall()
    tot: dict[tuple, int] = {}
    for et, day, v in raw:
        tot[(et, day)] = tot.get((et, day), 0) + int(
            np.floor(v * 1e4 + 0.5))
    assert rows
    for r in rows:
        rday = datetime.date.fromisoformat(r.day)
        cur = tot[(r.event_type, rday)] / 1e4
        # the lag is over observed days; find the closest earlier day
        days = sorted(d for (et, d) in tot if et == r.event_type)
        prev = tot[(r.event_type,
                    max(d for d in days if d < rday))] / 1e4
        assert r.total == pytest.approx(cur, abs=1e-4)
        assert r.prev == pytest.approx(prev, abs=1e-4)
        assert r.pct_change == pytest.approx((cur - prev) / prev,
                                             abs=1e-3)


def test_user_growth_matches_bruteforce(spark):
    """Active/new/returning/cumulative must match a pure-Python
    recomputation; cumulative must end at the total user count."""
    import datetime as _dt
    rows = {_dt.date.fromisoformat(r.day): r
            for r in QUERIES["q_user_growth"](spark, SF).collect()}
    raw = duckdb.sql(
        f"SELECT user_id, CAST(date_trunc('day', ts) AS DATE) "
        f"FROM '{SF}/events.parquet'").fetchall()
    active: dict = {}
    first: dict = {}
    for uid, d in raw:
        active.setdefault(d, set()).add(uid)
        if uid not in first or d < first[uid]:
            first[uid] = d
    assert set(rows) == set(active)
    cum = 0
    for d in sorted(active):
        r = rows[d]
        n_new = sum(1 for u, fd in first.items() if fd == d)
        cum += n_new
        assert r.n_active == len(active[d])
        assert r.n_new == n_new
        assert r.n_returning == len(active[d]) - n_new
        assert r.n_cum_users == cum
    assert cum == len(first)


def test_mann_whitney_matches_bruteforce(spark):
    """U and z must match a from-scratch midrank computation (exact
    tie handling, tie-corrected variance)."""
    row = QUERIES["q_mann_whitney"](spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT l_returnflag, l_quantity FROM '{SF}/lineitem.parquet' "
        f"WHERE l_returnflag IN ('A','N')").fetchall()
    import collections
    vals = sorted({v for _, v in raw})
    cnt = collections.Counter()
    c1 = collections.Counter()
    for f, v in raw:
        cnt[v] += 1
        if f == "A":
            c1[v] += 1
    n1 = sum(c1.values())
    n2 = sum(cnt.values()) - n1
    prior, r1, ties = 0, 0.0, 0
    for v in vals:
        c = cnt[v]
        r1 += c1[v] * (prior + (c + 1) / 2)
        ties += c ** 3 - c
        prior += c
    u = n1 * n2 + n1 * (n1 + 1) / 2 - r1
    n = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    z = (u - n1 * n2 / 2) / sigma
    assert row.n1 == n1 and row.n2 == n2
    assert row.u_stat == pytest.approx(u, abs=1e-2)
    assert row.z_stat == pytest.approx(z, abs=1e-3)


def test_mutual_info_matches_bruteforce(spark):
    """MI / entropies / NMI must match numpy; MI must be bounded by
    min(H_x, H_y) and NMI by [0, 1]."""
    row = QUERIES["q_mutual_info"](spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT event_type, CAST(hour(ts) AS INT) FROM "
        f"'{SF}/events.parquet'").fetchall()
    import collections
    joint = collections.Counter(raw)
    nx = collections.Counter(x for x, _ in raw)
    ny = collections.Counter(y for _, y in raw)
    n = len(raw)
    mi = sum(c / n * math.log(c * n / (nx[x] * ny[y]))
             for (x, y), c in joint.items())
    hx = -sum(c / n * math.log(c / n) for c in nx.values())
    hy = -sum(c / n * math.log(c / n) for c in ny.values())
    assert row.n == n
    assert row.mi_nats == pytest.approx(mi, abs=1e-3)
    assert row.h_x == pytest.approx(hx, abs=1e-3)
    assert row.h_y == pytest.approx(hy, abs=1e-3)
    assert row.nmi == pytest.approx(mi / math.sqrt(hx * hy), abs=1e-3)
    assert -1e-9 <= row.mi_nats <= min(hx, hy) + 1e-9
    assert -1e-9 <= row.nmi <= 1 + 1e-9


def test_rfm_scores_partition_customers_into_quintiles(spark):
    """Scores must be 1..5, derived from the exact quintile
    boundaries, and each (metric, score) bucket must be
    order-consistent: a higher score never has a worse metric."""
    rows = QUERIES["q_rfm_segment"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5
        assert 1 <= r.f_score <= 5
        assert 1 <= r.m_score <= 5
    # monotone consistency: sort by monetary; scores must be
    # non-decreasing along the sorted metric
    by_mon = sorted(rows, key=lambda r: r.mon_cents)
    assert all(a.m_score <= b.m_score
               for a, b in zip(by_mon, by_mon[1:]))
    by_rec = sorted(rows, key=lambda r: r.rec_days)
    assert all(a.r_score >= b.r_score
               for a, b in zip(by_rec, by_rec[1:]))
    # every quintile is inhabited on the fixture
    assert {r.m_score for r in rows} == {1, 2, 3, 4, 5}


def test_stream_benford_matches_batch(spark):
    """The streaming digit state must re-derive exactly the batch
    Benford rows."""
    batch = {r.digit: r for r in QUERIES["q_benford"](spark, SF).collect()}
    stream = {r.digit: r for r in
              QUERIES["q_stream_benford"](spark, SF).collect()}
    assert set(batch) == set(stream)
    for d, b in batch.items():
        s = stream[d]
        assert (b.n, b.obs_freq, b.exp_freq, b.dev) == \
               (s.n, s.obs_freq, s.exp_freq, s.dev)
