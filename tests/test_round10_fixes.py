"""Regression pins for the round-10 fixes (VERDICT/ADVICE round 9).

- Stateful processors must never let an all-null timestamp chunk poison
  ``max_ts`` with NaT (ADVICE r9 medium, ``streaming/stateful.py``):
  NaT comparisons are always False, so a NaT state would ignore every
  later real timestamp and silently diverge from the batch
  ``F.max('ts')`` recompute. The parity test that would catch this at
  stream runtime is environment-skipped here (no google.protobuf for
  the TWS twin), so the chunk-fold logic is pinned directly.
- Public argument guards raise ``ValueError`` instead of ``assert``
  (``python -O`` strips asserts — ADVICE r9 low); covered in
  test_round9_fixes.py / test_similarity_sizing.py updates plus the
  spot-checks here for the operators swept in the same pass.
"""

from __future__ import annotations

import pandas as pd
import pytest


class _StubState:
    """Minimal GroupState stand-in for driving the chunk-fold directly."""

    def __init__(self, value=None):
        self._value = value
        self.updated = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v


def _chunks():
    all_null = pd.DataFrame(
        {
            "ts": pd.to_datetime([None, None]),
            "value": [1.0, 2.0],
        }
    )
    real = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2026-01-02 03:04:05", "2026-01-01 00:00:00"]),
            "value": [3.0, None],
        }
    )
    return all_null, real


def test_apply_in_pandas_state_recovers_from_all_null_chunk():
    from transit_efficiency_analysis_spark.streaming.stateful import (
        _update_user_state,
    )

    all_null, real = _chunks()
    state = _StubState()
    (out,) = list(_update_user_state((7,), iter([all_null, real]), state))
    # the all-null chunk must not have pinned max_ts at NaT
    assert out["last_ts"].iloc[0] == pd.Timestamp("2026-01-02 03:04:05")
    n, total, max_ts = state.updated
    assert n == 4 and total == pytest.approx(6.0)
    assert max_ts == pd.Timestamp("2026-01-02 03:04:05")


def test_apply_in_pandas_state_all_null_only_keeps_none():
    from transit_efficiency_analysis_spark.streaming.stateful import (
        _update_user_state,
    )

    all_null, _ = _chunks()
    state = _StubState()
    (out,) = list(_update_user_state((7,), iter([all_null]), state))
    # no real timestamp seen: state stays None (not NaT), matching the
    # batch recompute where F.max over all-null is NULL
    _, _, max_ts = state.updated
    assert max_ts is None
    assert pd.isna(out["last_ts"].iloc[0])


def test_apply_in_pandas_state_heals_legacy_nat_state():
    from transit_efficiency_analysis_spark.streaming.stateful import (
        _update_user_state,
    )

    # a NaT persisted by the pre-fix code must not absorb later real ts
    _, real = _chunks()
    state = _StubState(value=(2, 1.0, pd.NaT))
    (out,) = list(_update_user_state((7,), iter([real]), state))
    assert out["last_ts"].iloc[0] == pd.Timestamp("2026-01-02 03:04:05")


def test_tws_processor_recovers_from_all_null_chunk():
    from transit_efficiency_analysis_spark.streaming.stateful import (
        RunningUserAggProcessor,
    )

    class _Handle:
        def getValueState(self, name, schema):
            return self.state

    class _ValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    proc = RunningUserAggProcessor()
    handle = _Handle()
    handle.state = _ValueState()
    proc.init(handle)
    all_null, real = _chunks()
    (out1,) = list(proc.handleInputRows((7,), iter([all_null]), None))
    assert pd.isna(out1["last_ts"].iloc[0])
    assert handle.state.get()[2] is None  # None, never NaT
    (out2,) = list(proc.handleInputRows((7,), iter([real]), None))
    assert out2["last_ts"].iloc[0] == pd.Timestamp("2026-01-02 03:04:05")
    assert out2["n_events"].iloc[0] == 4


def test_operator_arg_guards_raise_valueerror():
    from transit_efficiency_analysis_spark.operators.buckets import cap_buckets
    from transit_efficiency_analysis_spark.operators.rangejoin import (
        interval_point_join,
    )

    with pytest.raises(ValueError):
        cap_buckets(None, ["b"], "id", max_bucket_size=0)
    with pytest.raises(ValueError):
        interval_point_join(None, None, "a", "lo", "hi", bucket_width=0)
