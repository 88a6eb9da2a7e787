"""Rotation-hygiene gate logic (scripts/rotation_check.py) — pure, no
Spark: the gate must catch a deliberately-dropped registry entry, a
never-checked entry outside the prefix, and a dead prefix name."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from rotation_check import find_violations, latest_green


ROUNDS = {
    5: {"a": {"err": None, "hash_match": True},
        "b": {"err": None, "hash_match": True}},
    7: {"a": {"err": None, "hash_match": True},
        "c": {"err": None, "hash_match": True},
        # a red row is NOT a check
        "d": {"err": "boom", "hash_match": False}},
}


def test_latest_green_ignores_red_rows():
    latest = latest_green(ROUNDS)
    assert latest == {"a": 7, "b": 5, "c": 7}


def test_all_fresh_passes():
    latest = latest_green(ROUNDS)
    # upcoming r8, max_age 3: b at r5 is exactly 3 rounds old — OK
    v = find_violations(["a", "b", "c"], latest, [], 8, 3)
    assert v == []


def test_stale_entry_fails_unless_in_prefix():
    latest = latest_green(ROUNDS)
    v = find_violations(["a", "b", "c"], latest, [], 9, 3)
    assert len(v) == 1 and v[0].startswith("b:")
    # rotating it into the prefix clears the violation
    assert find_violations(["a", "b", "c"], latest, ["b"], 9, 3) == []


def test_dropped_entry_is_caught():
    """A registry query that never appears in any driver record (the
    deliberately-dropped case) fails until it enters the prefix."""
    latest = latest_green(ROUNDS)
    v = find_violations(["a", "b", "c", "new_q"], latest, [], 8, 3)
    assert len(v) == 1 and "NEVER driver-checked" in v[0]
    assert find_violations(["a", "b", "c", "new_q"], latest, ["new_q"], 8, 3) == []


def test_dead_prefix_name_is_caught():
    latest = latest_green(ROUNDS)
    v = find_violations(["a", "b", "c"], latest, ["typo_q"], 8, 3)
    assert len(v) == 1 and "no registry query" in v[0]


def test_rotation_period_derivation():
    """The default max_age is the structural rotation period
    ceil(registry / prefix), floored at 3 (r11): 188/50 -> 4; small
    registries keep the historical 3; a degenerate prefix can't divide
    by zero."""
    from rotation_check import rotation_period

    assert rotation_period(150, 50) == 3
    assert rotation_period(151, 50) == 4
    assert rotation_period(188, 50) == 4
    assert rotation_period(189, 50) == 4
    assert rotation_period(10, 50) == 3   # floor
    assert rotation_period(10, 0) == 10   # no prefix: every entry stale-checked
