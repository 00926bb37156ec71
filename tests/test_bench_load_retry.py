"""bench.py's bounded load wait (round 16, VERDICT r15 ask #7):
BENCH_r14 and r15 were both load-contaminated; the gate reported
honestly but the artifact of record never got a fair shot. The wait
and the retry hook must be bounded, honest, and disabled-able."""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_wait_returns_immediately_when_idle(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(os, "getloadavg", lambda: (1.0, 1.0, 1.0))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    assert bench._wait_for_idle(4.0, 240.0) == 0.0
    assert not slept


def test_wait_polls_until_load_drops(monkeypatch):
    bench = _bench()
    # three busy polls, then idle
    seq = iter([(9.0,) * 3, (7.0,) * 3, (5.0,) * 3, (3.9,) * 3])
    monkeypatch.setattr(os, "getloadavg", lambda: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    waited = bench._wait_for_idle(4.0, 240.0)
    assert waited == 30.0  # 3 sleeps of 10s before the idle poll


def test_wait_respects_budget(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(os, "getloadavg", lambda: (99.0, 99.0, 99.0))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    waited = bench._wait_for_idle(4.0, 35.0)
    # 10s polls fit the 35s budget 3 times; never overshoots
    assert waited == 30.0 and sum(sleeps) == 30.0


def test_wait_handles_missing_getloadavg(monkeypatch):
    bench = _bench()

    def boom():
        raise OSError("no loadavg on this platform")

    monkeypatch.setattr(os, "getloadavg", boom)
    assert bench._wait_for_idle(4.0, 240.0) == 0.0


def test_external_cpu_cores_arithmetic():
    bench = _bench()
    # box burned 100 cpu-seconds, our tree burned 90 -> 10 external
    # cpu-seconds over 10 wall-seconds = 1.0 cores average
    assert bench._external_cpu_cores((100.0, 50.0), (200.0, 140.0), 10.0) == 1.0


def test_external_cpu_cores_none_propagates():
    bench = _bench()
    assert bench._external_cpu_cores(None, (1.0, 1.0), 10.0) is None
    assert bench._external_cpu_cores((1.0, 1.0), None, 10.0) is None
    assert bench._external_cpu_cores((1.0, 1.0), (2.0, 2.0), 0.0) is None


def test_external_cpu_cores_clamps_negative():
    """Reaped-children accounting can make the own-tree delta slightly
    exceed the box delta (a child's lifetime CPU lands on the parent at
    reap time); the estimate must clamp at 0, never go negative."""
    bench = _bench()
    assert bench._external_cpu_cores((100.0, 10.0), (101.0, 20.0), 5.0) == 0.0


def test_cpu_snapshot_counts_own_spin():
    """The self-tree counter must attribute THIS process's burned CPU:
    spin ~0.3 cpu-seconds and require most of it to appear in the own
    component (the box component necessarily grows at least as much)."""
    import time as _time

    bench = _bench()
    before = bench._cpu_snapshot()
    assert before is not None, "Linux test box must expose /proc"
    t0 = _time.process_time()
    x = 0
    while _time.process_time() - t0 < 0.3:
        x += 1
    after = bench._cpu_snapshot()
    box_delta = after[0] - before[0]
    own_delta = after[1] - before[1]
    assert own_delta >= 0.15, f"own CPU delta {own_delta} missed the spin"
    assert box_delta >= own_delta - 0.05, "box counter must cover own work"
