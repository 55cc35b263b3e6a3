"""Unit tests for the driver-window rotation ordering in
__spark_entry__._rotated (round-13 VERDICT item 5).

The ordering contract (normative in the _rotated docstring):
  (a) never-rowed keys first, oldest registration cohort first,
      registry order within a cohort;
  (b) driver greens sorted by (latest green round, registry index) —
      oldest-green-first with a deterministic registry tie-break;
  (c) the ordering is total over the registry — no key dropped.

These tests inject a synthetic green map so they are independent of
the CORRECTNESS_r*.json artifacts on disk.
"""
import importlib.util
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_HERE, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry_mod():
    return _entry_module()


def test_total_over_registry(entry_mod):
    """Every registry key appears exactly once, with any green map."""
    from engine import registry
    registry.load_all()
    keys = list(registry.QUERIES)
    for green in ({}, {keys[0]: 3}, {k: 5 for k in keys}):
        out = entry_mod._rotated(registry.QUERIES, green=green or None) \
            if green else entry_mod._rotated(registry.QUERIES,
                                             green={keys[0]: 99})
        assert sorted(out) == sorted(keys)
        assert len(out) == len(set(out))


def test_waiting_lead_greens_follow(entry_mod):
    """Keys absent from the green map precede every green key."""
    keys = {f"k{i}": None for i in range(10)}
    green = {"k0": 2, "k3": 5, "k7": 1}
    out = entry_mod._rotated(keys, green=green)
    waiting = [k for k in out if k not in green]
    assert out[: len(waiting)] == waiting


def test_greens_oldest_round_first_registry_tiebreak(entry_mod):
    """Greens sort by (round, registry index) — provably oldest-first,
    ties broken by registry declaration order."""
    keys = {k: None for k in ["a", "b", "c", "d", "e"]}
    green = {"a": 9, "b": 3, "c": 3, "d": 7, "e": 3}
    out = entry_mod._rotated(keys, green=green)
    assert out == ["b", "c", "e", "d", "a"]


def test_failed_latest_row_rotates_to_front(entry_mod):
    """A key whose latest driver row failed has no green entry and so
    re-enters the waiting tier at the front."""
    keys = {k: None for k in ["x", "y", "z"]}
    out = entry_mod._rotated(keys, green={"x": 4, "z": 4})
    assert out[0] == "y"


def test_cohort_demotion_order(entry_mod):
    """Within the waiting tier, pre-cohort keys precede cohort keys and
    older cohorts precede newer ones (synthetic members injected)."""
    mod = entry_mod
    keys = {"old_key": None, "r5_key": None, "r13_key": None}
    saved5, saved13 = mod._R05_NEW, mod._R13_NEW
    try:
        mod._R05_NEW = set(saved5) | {"r5_key"}
        mod._R13_NEW = set(saved13) | {"r13_key"}
        out = mod._rotated(keys, green={"__unused__": 1})
    finally:
        mod._R05_NEW, mod._R13_NEW = saved5, saved13
    assert out == ["old_key", "r5_key", "r13_key"]


def test_r13_cohort_leads_round14_window(entry_mod):
    """Integration against the REAL artifacts: all 41 _R13_NEW keys are
    in the first 41 slots of the round-14 ordering (the round-13
    verdict's top priority), followed by the stalest greens."""
    from engine import registry
    registry.load_all()
    out = entry_mod._rotated(registry.QUERIES)
    green = entry_mod._driver_green()
    r13 = entry_mod._R13_NEW
    never_rowed = [k for k in r13 if k not in green]
    if not never_rowed:
        pytest.skip("r13 cohort already has driver rows (post-round-14)")
    head = set(out[: len(never_rowed)])
    assert head == set(never_rowed)
    # spare slots immediately after are the oldest greens
    tail_rounds = [green[k] for k in out[len(never_rowed):] if k in green]
    assert tail_rounds == sorted(tail_rounds)
