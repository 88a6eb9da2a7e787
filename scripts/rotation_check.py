"""Driver-prefix rotation hygiene gate (VERDICT r7 item 7).

The correctness driver hashes only a ~50-entry prefix of ``queries()``
per round, so every registry entry must re-enter the prefix within a
bounded number of rounds or its driver evidence goes stale — and a
query that NEVER enters it is never driver-checked at all (this
happened to k_quantile_sample in r7).  This script recomputes the
latest-driver-check round per registry entry from the committed
``CORRECTNESS_r*.json`` records and FAILS (non-zero exit) unless every
entry either

* was hash-green within the last ``max_age`` driver rounds (relative
  to the UPCOMING round = newest record + 1), or
* is listed in the current ``DRIVER_PRIORITY`` prefix (it will be
  checked this round).

``max_age`` defaults to the ROTATION PERIOD ceil(registry / prefix)
(floor 3) — see :func:`rotation_period`: with 188 entries and 50 driver
slots a full re-check takes 4 rounds, so demanding age ≤ 3 of every
entry is structurally impossible the moment the prefix also has to
carry changed-code re-gates; the gate instead flags exactly the
entries that MISSED their rotation window.  ``--max-age N`` overrides.

It also fails on prefix entries that name no registry query (typos or
dead entries silently waste prefix slots: the driver hashes exactly the
first 50 of ``queries()``, so a dead name drops a real query off the
end).

Run as a round-end gate:  ``python scripts/rotation_check.py``
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(repo_dir: str) -> dict[int, dict]:
    """{round: parsed CORRECTNESS json} for every committed record."""
    out = {}
    for path in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def latest_green(rounds: dict[int, dict]) -> dict[str, int]:
    """Latest round each query was fully hash-green in a driver run.
    Red/errored rows do not count as a check."""
    latest: dict[str, int] = {}
    for rnd, data in rounds.items():
        for name, rec in data.items():
            if rec.get("err") is None and rec.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def find_violations(
    registry: list[str],
    latest: dict[str, int],
    priority: list[str],
    current_round: int,
    max_age: int,
) -> list[str]:
    """Human-readable violation list; empty == gate passes."""
    violations = []
    pset = set(priority)
    for name in registry:
        last = latest.get(name)
        if name in pset:
            continue  # will be checked this round
        if last is None:
            violations.append(
                f"{name}: NEVER driver-checked and not in the current prefix"
            )
        elif current_round - last > max_age:
            violations.append(
                f"{name}: last driver check r{last} is {current_round - last} "
                f"rounds old (> {max_age}) and not in the current prefix"
            )
    rset = set(registry)
    for name in priority:
        if name not in rset:
            violations.append(
                f"prefix entry {name!r} names no registry query (typo/dead "
                f"entry — it silently drops a real query off the 50-entry "
                f"driver prefix)"
            )
    return violations


def rotation_period(n_registry: int, n_prefix: int) -> int:
    """The structural bound on entry age: the driver hashes exactly
    ``n_prefix`` entries per round, so a registry of ``n_registry``
    entries takes ceil(n_registry / n_prefix) rounds to fully re-check
    even under perfect round-robin — in steady state every entry's age
    reaches exactly that period before its slot comes up again.  The
    gate's default max_age is therefore max(3, period): tighter would
    demand the arithmetic-impossible once the registry outgrows
    3×prefix (188 entries / 50 slots → period 4, the r11 state); an
    entry older than the period MISSED its rotation window and still
    fails.  ``--max-age`` overrides for ad-hoc audits."""
    import math

    return max(3, math.ceil(n_registry / max(1, n_prefix)))


def main() -> int:
    max_age = None
    for i, a in enumerate(sys.argv):
        if a == "--max-age":
            max_age = int(sys.argv[i + 1])
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registry = list(entrymod.queries().keys())
    priority = list(entrymod.DRIVER_PRIORITY)
    if max_age is None:
        max_age = rotation_period(len(registry), len(priority))
    rounds = load_rounds(REPO)
    if not rounds:
        print("no CORRECTNESS_r*.json records found")
        return 1
    current_round = max(rounds) + 1  # the upcoming driver run
    latest = latest_green(rounds)
    hist: dict[int, int] = {}
    for name in registry:
        r = latest.get(name, 0)
        hist[r] = hist.get(r, 0) + 1
    print(
        f"registry={len(registry)} prefix={len(priority)} "
        f"upcoming=r{current_round} max_age={max_age}"
    )
    print(
        "latest-check histogram: "
        + ", ".join(
            f"{'never' if r == 0 else f'r{r}'}:{n}"
            for r, n in sorted(hist.items())
        )
    )
    violations = find_violations(
        registry, latest, priority, current_round, max_age
    )
    if violations:
        print("ROTATION VIOLATIONS:")
        for v in violations:
            print(" -", v)
        return 1
    print("ROTATION OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
