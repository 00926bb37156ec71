#!/usr/bin/env python
"""Mechanical enforcement of the correctness-window freshness SLO.

Round-10 post-mortem (VERDICT r10): the planned window rotation lived
only in a comment and was never installed — CORRECTNESS_r10.json's key
set came out byte-identical to r9's, 43 rows breached the freshness SLO,
and two brand-new demos shipped with no driver check at all. Nothing
failed, because nothing checked. This tool is that check: it loads every
committed CORRECTNESS_r*.json plus the live registry/_WINDOW and exits
non-zero unless the CURRENT window, once the driver runs it, restores
the SLO. Wired into pytest via tests/test_window.py so `pytest tests/`
is red whenever a rotation was skipped or a new demo missed its slot.

Rules enforced (see demo/__init__.py's SLO block):

R1  Every registered-but-never-driver-checked entry must be in the
    current window (the SLO deadline is "the round after it lands";
    an absent entry would breach it unconditionally).
R2  The window must not repeat the previous round's checked key set
    (the exact round-10 failure signature).
R3  Freshness: with the window counted as refreshed at the upcoming
    round, no entry's latest driver row may be older than one full
    rotation cycle = ceil(len(registry) / 50) rounds. (4 rounds was
    the original figure at ~200 entries; at 237 a strict oldest-first
    rotation can't do better than 5 — the cycle-length form is the
    tightest achievable bound, recomputed as the registry grows.)
R4  The window is exactly 50 unique registered names and IS the first
    50 registry entries (what the driver actually checks).

Usage: python tools/check_window.py   (exit 0 = SLO holds)
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50


def load_rows() -> tuple[dict[str, int], int]:
    """(latest driver round per query, max round on record)."""
    latest: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def check(window: list[str], registry_names: list[str]) -> list[str]:
    """Return a list of violation messages (empty = SLO holds)."""
    errors: list[str] = []
    latest, max_round = load_rows()
    if max_round == 0:
        return ["no CORRECTNESS_r*.json files found"]
    upcoming = max_round + 1  # the round the current window will run in
    cycle = max(4, math.ceil(len(registry_names) / WINDOW_SIZE))

    # R4 — window shape
    if len(window) != WINDOW_SIZE or len(set(window)) != WINDOW_SIZE:
        errors.append(
            f"R4: window must be {WINDOW_SIZE} unique names, got "
            f"{len(window)} ({len(set(window))} unique)"
        )
    unregistered = [n for n in window if n not in set(registry_names)]
    if unregistered:
        errors.append(f"R4: window names not registered: {unregistered}")
    if registry_names[:WINDOW_SIZE] != window:
        errors.append(
            "R4: _WINDOW is not the first 50 registry entries — the "
            "driver would check a different set than the one declared"
        )

    # R1 — never-checked entries must take a slot now
    never = [n for n in registry_names if n not in latest]
    missing_slot = [n for n in never if n not in set(window)]
    if missing_slot:
        errors.append(
            "R1: registered-but-never-driver-checked entries absent from "
            f"the current window (deadline is round {upcoming}): "
            f"{missing_slot}"
        )

    # R2 — no skipped rotation
    prev_path = os.path.join(_REPO, f"CORRECTNESS_r{max_round:02d}.json")
    if not os.path.exists(prev_path):
        prev_path = os.path.join(_REPO, f"CORRECTNESS_r{max_round}.json")
    with open(prev_path) as f:
        prev_keys = set(json.load(f))
    if set(window) == prev_keys:
        errors.append(
            f"R2: window repeats round {max_round}'s checked set "
            "verbatim — rotation was skipped"
        )

    # R3 — freshness with the current window counted as refreshed
    stale = sorted(
        (n, latest[n])
        for n in registry_names
        if n in latest
        and n not in set(window)
        and upcoming - latest[n] > cycle
    )
    if stale:
        errors.append(
            f"R3: entries older than the {cycle}-round rotation cycle "
            f"and not in this round's window (latest row in parens): "
            + ", ".join(f"{n} (r{r})" for n, r in stale)
        )
    return errors


def main() -> int:
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from transit_efficiency_analysis_spark.demo import _WINDOW, load_registry

    registry_names = list(load_registry())
    errors = check(_WINDOW, registry_names)
    latest, max_round = load_rows()
    if errors:
        print(f"check_window: FAIL ({len(errors)} violation(s))")
        for e in errors:
            print(f"  - {e}")
        return 1
    cycle = max(4, math.ceil(len(registry_names) / WINDOW_SIZE))
    print(
        f"check_window: OK — {len(registry_names)} registry entries, "
        f"window {len(_WINDOW)}, cycle {cycle} rounds, latest record "
        f"r{max_round}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
