"""Property-based gap-fill contract: for ANY observation pattern (single
observations, long gaps, dense runs), the spine is exactly the per-user
closed day range and the fill column equals a pure-Python
last-observation-carried-forward mirror. Values are exact multiples of
0.25 so the decimal parity cast is lossless and comparison is exact."""

from __future__ import annotations

from datetime import date, datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from transit_efficiency_analysis_spark.demo.windowed import gapfill_ffill

_D0 = date(2024, 3, 1)

_obs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # user
        st.integers(min_value=0, max_value=20),   # day offset
        st.integers(min_value=-8, max_value=8),   # value quarters
    ),
    min_size=1,
    max_size=30,
)


def _mirror(rows):
    daily: dict[tuple[int, date], tuple[int, float]] = {}
    for u, d, q in rows:
        day = _D0 + timedelta(days=d)
        n, v = daily.get((u, day), (0, 0.0))
        daily[(u, day)] = (n + 1, v + q * 0.25)
    out = {}
    for u in {r[0] for r in rows}:
        days = [k[1] for k in daily if k[0] == u]
        last = None
        cur = min(days)
        while cur <= max(days):
            if (u, cur) in daily:
                n, v = daily[(u, cur)]
                last = v
                out[(u, cur)] = (n, False, last)
            else:
                out[(u, cur)] = (0, True, last)
            cur += timedelta(days=1)
    return out


@settings(max_examples=12, deadline=None)
@given(rows=_obs)
def test_gapfill_matches_locf_mirror(spark, rows):
    data = [
        (i, datetime.combine(_D0 + timedelta(days=d), datetime.min.time())
            .replace(hour=12), u, "click", q * 0.25, None)
        for i, (u, d, q) in enumerate(rows)
    ]
    e = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r.user_id, r.day): (r.n_obs, r.is_filled, r.filled_value)
        for r in gapfill_ffill(e).collect()
    }
    assert got == _mirror(rows)
