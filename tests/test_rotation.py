"""The correctness-window rotation must put driver-unverified keys
first (inside the driver's 50-key window) and order verified keys
oldest-confirmation-first, deriving all of it from the driver's own
CORRECTNESS_r*.json artifacts."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from engine import registry  # noqa: E402

registry.load_all()


def test_waiting_keys_lead_the_window():
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    # round-13 newcomers are EXCLUDED from the waiting tier by design:
    # the round-13 window belongs to the 31 _R12_NEW keys earning
    # their first driver rows, so _R13_NEW keys go behind even the
    # greens until round 14.
    waiting = [k for k in q
               if k not in green and k not in entry._R13_NEW]
    # no green key may hold a window slot while a waiting key sits
    # outside it: the first min(|waiting|, 50) slots are all waiting
    head = q[:min(len(waiting), 50)]
    assert all(k in set(waiting) for k in head), (
        f"green key inside the window ahead of {len(waiting)} waiting")
    # and if the window has room, every waiting key is inside it
    if len(waiting) <= 50:
        assert all(k in set(q[:50]) for k in waiting)


def test_r09_newcomers_lead_the_round10_window():
    """The _R08_NEW drain completed in CORRECTNESS_r09, so the round-9
    verdict's top priority is the 10 _R09_NEW keys earning their
    FIRST driver rows: every never-rowed _R09_NEW key must sort ahead
    of every driver-green key (i.e. inside the 50-key window)."""
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    waiting9 = [k for k in entry._R09_NEW if k not in green]
    if not waiting9:  # all have driver rows now — nothing to pin
        return
    first_green = min(q.index(k) for k in q if k in green)
    for k in waiting9:
        assert q.index(k) < first_green, (
            f"{k} sits behind a green key — it misses its first "
            f"driver row again")
        assert q.index(k) < 50, f"{k} outside the 50-key window"


def test_r12_newcomers_lead_the_round13_window():
    """The round-12 staleness drain completed in CORRECTNESS_r12
    (0 fails), so the round-12 verdict's top priority is the 31
    _R12_NEW keys earning their FIRST driver rows: every never-rowed
    _R12_NEW key must sort ahead of every driver-green key (i.e.
    inside the 50-key window)."""
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    waiting12 = [k for k in entry._R12_NEW if k not in green]
    if not waiting12:  # all have driver rows now — nothing to pin
        return
    first_green = min(q.index(k) for k in q if k in green)
    for k in waiting12:
        assert q.index(k) < first_green, (
            f"{k} sits behind a green key — it misses its first "
            f"driver row again")
        assert q.index(k) < 50, f"{k} outside the 50-key window"


def test_r13_newcomers_sort_behind_every_green():
    """Round-13 newcomers take NO window slot while the round-13
    window gives _R12_NEW its first rows and drains the oldest
    greens: every never-rowed _R13_NEW key must sort after every
    driver-green key (they get their first rows in round 14)."""
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    back = [k for k in entry._R13_NEW
            if k in set(q) and k not in green]
    if not back:  # all have driver rows now — demotion is over
        return
    last_green = max(q.index(k) for k in q if k in green)
    for k in back:
        assert q.index(k) > last_green, (
            f"{k} holds a window slot while longer-waiting keys "
            f"sit outside it")


def test_tiered_is_total_over_cohorted_keys():
    """tiered() must return every key it is given (round-11 ADVICE:
    a missed upstream _R12_NEW filter must not silently drop a
    registry key) — even keys of the newest cohort."""
    sample = (list(entry._R10_NEW)[:3] + list(entry._R12_NEW)
              + ["q_agg_pricing_summary", "q_stitch_3d"])
    # exercise via _rotated with an input that skips the upstream
    # _R12_NEW pre-filter path: call the inner ordering end-to-end
    out = entry._rotated(sample)
    assert sorted(out) == sorted(sample), (
        f"_rotated dropped keys: {set(sample) - set(out)}")


def test_oldest_greens_lead_the_round12_window():
    """Verdict r11 item 7 (staleness drain): with zero waiting keys,
    the window head must be the oldest-confirmed greens — every key
    whose latest green row is the minimum round leads the window."""
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    waiting = [k for k in q
               if k not in green and k not in entry._R12_NEW]
    if waiting:  # drain only applies when everything is green
        return
    oldest = min(green[k] for k in q if k in green)
    stalest = [k for k in q if green.get(k) == oldest]
    for k in stalest[:50]:
        assert q.index(k) < 50, (
            f"{k} (green since r{oldest}) missed the re-verification "
            f"window")


def test_green_tiers_ordered_oldest_first():
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    rounds = [green[k] for k in q if k in green]
    assert rounds == sorted(rounds)


def test_failed_driver_row_rotates_to_front(tmp_path, monkeypatch):
    """A key whose LATEST driver row failed must be re-queued as
    waiting even if an older round had it green."""
    here = str(tmp_path)
    with open(os.path.join(here, "CORRECTNESS_r01.json"), "w") as f:
        json.dump({"q_x": {"hash_match": True, "err": None,
                           "spark_rows": 1}}, f)
    with open(os.path.join(here, "CORRECTNESS_r02.json"), "w") as f:
        json.dump({"q_x": {"hash_match": False, "err": None,
                           "spark_rows": 1},
                   "q_y": {"hash_match": None, "err": "no_oracle",
                           "spark_rows": 5}}, f)
    monkeypatch.setattr(os.path, "dirname", lambda p: here)
    green = entry._driver_green()
    assert "q_x" not in green          # latest row failed
    assert green.get("q_y") == 2       # rows-only completed counts


def test_round5_newcomers_wait_behind_older_keys():
    """Waiting keys must be served oldest-cohort-first: keys waiting
    since round 3/4, then the round-5 rotation-plan newcomers
    (_R05_NEW), then the round-5 build-phase newcomers (_R06_NEW),
    then the round-6 build-phase newcomers (_R06B_NEW), then the
    round-6 final-wave newcomers (_R06C_NEW) — artifacts
    cannot date never-rowed keys, so the cohort sets are explicit."""
    q = list(entry._rotated(registry.QUERIES))
    green = entry._driver_green()
    waiting = [k for k in q if k not in green]

    def tier(k):
        if k in entry._R13_NEW:
            return 11     # behind even the greens (round-13 cohort)
        if k in entry._R12_NEW:
            return 10
        if k in entry._R11_NEW:
            return 9
        if k in entry._R10_NEW:
            return 8
        if k in entry._R09_NEW:
            return 7
        if k in entry._R08_NEW:
            return 6
        if k in entry._R07_NEW:
            return 5
        if k in entry._R06C_NEW:
            return 4
        if k in entry._R06B_NEW:
            return 3
        if k in entry._R06_NEW:
            return 2
        if k in entry._R05_NEW:
            return 1
        return 0

    tiers = [tier(k) for k in waiting]
    assert tiers == sorted(tiers), (
        f"waiting keys out of cohort order: "
        f"{[(k, tier(k)) for k in waiting]}")


def test_every_registered_key_is_cohorted_or_green():
    """A key that is neither driver-green nor in ANY cohort set sorts
    into the oldest waiting tier and queue-jumps — the priority
    inversion the round-6 review caught. Every never-rowed key must
    belong to a cohort."""
    green = entry._driver_green()
    cohorts = (set(entry._R02_GREEN) | set(entry._R03_GREEN)
               | entry._R05_NEW | entry._R06_NEW | entry._R06B_NEW
               | entry._R06C_NEW | entry._R07_NEW | entry._R08_NEW
               | entry._R09_NEW | entry._R10_NEW | entry._R11_NEW
               | entry._R12_NEW | entry._R13_NEW)
    stray = [k for k in registry.QUERIES
             if k not in green and k not in cohorts]
    assert not stray, (
        f"keys missing from every rotation cohort: {stray} — add "
        f"them to the newest _R0xB_NEW set in __spark_entry__.py")
