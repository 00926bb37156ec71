"""Window-bookkeeping guards for the driver's 50-entry correctness window.

Round-4 post-mortem: ``q_text_pack`` was filed under "prior-green filler"
while actually being brand new (and red). These tests make that class of
mislabel impossible — a "filler" name must have a green driver row on
record in some committed ``CORRECTNESS_r*.json``.
"""

from __future__ import annotations

import glob
import json
import os

from transit_efficiency_analysis_spark.demo import (
    _WINDOW,
    _WINDOW_FILLER,
    load_registry,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ever_green() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True:
                    names.add(name)
    return names


def test_window_is_50_registered_names():
    registry = load_registry()
    assert len(_WINDOW) == 50
    assert len(set(_WINDOW)) == 50, "window has duplicate names"
    missing = [n for n in _WINDOW if n not in registry]
    assert not missing, f"window names not registered: {missing}"
    # the window must actually be the FIRST 50 registry entries
    assert list(registry)[:50] == _WINDOW


def test_freshness_slo_holds():
    """tools/check_window.py must pass: never-checked entries hold a
    slot, the window is not a verbatim repeat of the previous round's
    set, and nothing falls further behind than one rotation cycle.
    Added round 11 after the round-10 rotation was skipped silently."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        import check_window
    finally:
        sys.path.pop(0)
    errors = check_window.check(_WINDOW, list(load_registry()))
    assert not errors, "freshness SLO violated:\n" + "\n".join(errors)


def test_filler_names_have_prior_green_row():
    green = _ever_green()
    assert green, "no CORRECTNESS_r*.json files found"
    impostors = [n for n in _WINDOW_FILLER if n not in green]
    assert not impostors, (
        f"window 'filler' entries without a prior green driver row "
        f"(belongs in _WINDOW_FRONT instead): {impostors}"
    )


def _check_with(tmp_path, monkeypatch, rounds: dict[int, list[str]],
                window: list[str], registry: list[str]):
    """Run check_window.check against synthetic CORRECTNESS files."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        import check_window
    finally:
        sys.path.pop(0)
    for rnd, names in rounds.items():
        payload = {n: {"hash_match": True} for n in names}
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
            json.dump(payload, f)
    monkeypatch.setattr(check_window, "_REPO", str(tmp_path))
    monkeypatch.setattr(check_window, "WINDOW_SIZE", len(window))
    return check_window.check(window, registry)


def test_check_window_flags_skipped_rotation(tmp_path, monkeypatch):
    """The exact round-10 failure signature: window == previous round's
    checked set must fail R2."""
    reg = [f"q{i}" for i in range(6)]
    errs = _check_with(
        tmp_path, monkeypatch,
        rounds={1: ["q0", "q1", "q2"], 2: ["q0", "q1", "q2"]},
        window=["q0", "q1", "q2"], registry=reg,
    )
    assert any("R2" in e for e in errs)


def test_check_window_flags_unwindowed_new_entry(tmp_path, monkeypatch):
    reg = ["q0", "q1", "q2", "q_new"]
    errs = _check_with(
        tmp_path, monkeypatch,
        rounds={1: ["q0", "q1", "q2"]},
        window=["q0", "q1", "q2"], registry=reg,
    )
    assert any("R1" in e and "q_new" in e for e in errs)


def test_check_window_flags_stale_entry_beyond_cycle(tmp_path, monkeypatch):
    # 6 registry entries, window 2 -> cycle max(4, 3) = 4 rounds.
    # q5 last checked r1; at upcoming r7 its age is 6 > 4 and it has no
    # slot -> R3.
    reg = [f"q{i}" for i in range(6)]
    errs = _check_with(
        tmp_path, monkeypatch,
        rounds={1: reg, 6: ["q0", "q1"]},
        window=["q2", "q3"], registry=reg,
    )
    assert any("R3" in e and "q5" in e for e in errs)


def test_check_window_passes_honest_rotation(tmp_path, monkeypatch):
    reg = [f"q{i}" for i in range(4)]
    errs = _check_with(
        tmp_path, monkeypatch,
        rounds={1: reg, 2: ["q0", "q1"]},
        window=["q2", "q3"], registry=["q2", "q3", "q0", "q1"],
    )
    assert errs == []
