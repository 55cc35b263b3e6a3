"""Hypothesis properties for the round-13 kernels, driven on
GENERATED data (not the fixtures) so they cover shapes the fixtures
never produce:

- bloom PER-SLOT membership (the round-13 ADVICE fix): a pure model
  of the engine's count(*)==k pass test must equal real bloom
  semantics (all probed bits set) for ARBITRARY member/probe sets —
  including grams whose k hash positions collide, the exact case the
  round-12 count(DISTINCT p)==k formulation rejected.
- the _budget_plan allocation lane: for ARBITRARY per-source token
  distributions the isqrt weights, floor allocations and ppm tails
  must satisfy the planner's arithmetic invariants (budget exhausted
  to within |sources| floor quanta, shares summing to ≤ 1e6, the
  zero-token source never dividing by zero the others' lanes).
- the rolling-median 2x-integer lane: the engine's "publish twice
  the median" trick must equal a brute sorted-window replay for
  ARBITRARY integer series, odd and even windows alike.
"""
from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st

GRAM = st.text(alphabet="0123456789abcdef", min_size=4, max_size=8)


def _pos(gh: str, j: int, m: int) -> int:
    return int(hashlib.md5(f"{gh}#b{j}".encode())
               .hexdigest()[:8], 16) % m


@settings(max_examples=200, deadline=None)
@given(st.sets(GRAM, min_size=1, max_size=30),
       st.sets(GRAM, min_size=1, max_size=30),
       st.sampled_from([16, 64, 256, 4096]))
def test_bloom_per_slot_count_equals_real_membership(hold, corp, m):
    """count of matched probe ROWS == k  ⟺  every probed bit set —
    the engine's per-slot join semantics (round-13 fix) modeled
    exactly: probes keep duplicate positions, the bit set is
    distinct. Small m forces position collisions, the regime where
    the old count(DISTINCT p) formulation broke."""
    k = 3
    bits = {_pos(g, j, m) for g in hold for j in range(k)}
    for g in corp:
        probes = [_pos(g, j, m) for j in range(k)]
        engine_pass = sum(p in bits for p in probes) == k
        real_pass = all(p in bits for p in probes)
        assert engine_pass == real_pass
        if g in hold:
            assert engine_pass, "member rejected — false negative"


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(alphabet="st", min_size=1, max_size=4),
                       st.integers(min_value=0, max_value=10**13),
                       min_size=1, max_size=12))
def test_budget_plan_arithmetic_invariants(tokens):
    """The planner lane's exact-integer algebra on arbitrary
    per-source token counts (including zero-token sources and
    counts past float-sqrt precision)."""
    weights = {s: math.isqrt(n) for s, n in tokens.items()}
    s_tot = sum(weights.values())
    b_tot = 2 * sum(tokens.values())
    if s_tot == 0:
        return  # all-empty corpus: the lane emits no allocations
    allocs = {s: b_tot * w // s_tot for s, w in weights.items()}
    shares = {s: 1_000_000 * w // s_tot for s, w in weights.items()}
    # floor allocation never over-commits, and exhausts the budget
    # to within one quantum per source
    assert sum(allocs.values()) <= b_tot
    assert b_tot - sum(allocs.values()) \
        <= len(tokens) * max(b_tot // s_tot, 1)
    assert sum(shares.values()) <= 1_000_000
    # temperature flattening: weights are monotone in tokens and
    # sub-linear (alpha = 0.5)
    for a in tokens:
        for b in tokens:
            if tokens[a] <= tokens[b]:
                assert weights[a] <= weights[b]
    for s, n in tokens.items():
        if n > 0:
            full, tail = divmod(allocs[s], n)
            assert allocs[s] == full * n + tail
            assert 0 <= tail * 1_000_000 // n < 1_000_000


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=10))
def test_rolling_median_x2_equals_brute_replay(series, w):
    """2x the median of any w-row suffix window is the sum of the
    two middle order statistics (even n) or twice the middle one
    (odd n) — the exact-integer identity the engine's
    percentile(cents, 0.5) lane publishes."""
    for i in range(len(series)):
        win = sorted(series[max(0, i - w + 1):i + 1])
        n = len(win)
        m2 = 2 * win[n // 2] if n % 2 == 1 \
            else win[n // 2 - 1] + win[n // 2]
        # the engine formula: 2 * percentile_0.5 with linear
        # interpolation on (n-1) — identical by construction
        lo = win[(n - 1) // 2]
        hi = win[n // 2]
        assert m2 == lo + hi
