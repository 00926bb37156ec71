"""Golden tests for the delay consolidation (FIXTURES.md §5.3/5.6/5.7).

Hand-built gtfs_data/trip_updates fixtures covering all four sentinel
combinations, the diff-asymmetry (actual=NULL but diff=0.0), the 4-branch
average, unmatched keys, and the string→bigint stop_id join cast.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from transit_efficiency_analysis_spark.operators.delay import compute_delays
from transit_efficiency_analysis_spark.schemas import (
    GTFS_DATA,
    TRIP_UPDATES,
    TRIP_UPDATES_WITH_DIFFS_COLUMNS,
)

EPOCH0 = datetime(1970, 1, 1, 0, 0)
SCHED_ARR = datetime(2023, 6, 15, 14, 30)  # 10:30 EDT Thursday
SCHED_DEP = datetime(2023, 6, 15, 14, 35)
D = date(2023, 6, 15)
CREATED = datetime(2026, 1, 1)


def _gd_row(trip, seq, stop):
    return (trip, D, seq, stop, "R1", f"stop_{stop}", "Main line", SCHED_ARR, SCHED_DEP, "46.5, -81.0")


def _tu_row(trip, seq, stop, arr, dep):
    return (trip, D, seq, stop, arr, dep, "Clear", "clear", 21.5, CREATED, None)


@pytest.fixture(scope="module")
def result(spark):
    gd = spark.createDataFrame(
        [
            _gd_row("t1", 1, 100),
            _gd_row("t1", 2, 200),
            _gd_row("t1", 3, 300),
            _gd_row("t1", 4, 400),
            _gd_row("t9", 1, 900),  # no realtime partner → dropped by inner join
            _gd_row("t2", 1, 7),  # joins against a leading-zero string stop_id
        ],
        GTFS_DATA,
    )
    tu = spark.createDataFrame(
        [
            # both present: arr +5 min, dep -3 min
            _tu_row("t1", 1, "100", datetime(2023, 6, 15, 14, 35), datetime(2023, 6, 15, 14, 32)),
            # arrival missing, departure +2 min
            _tu_row("t1", 2, "200", EPOCH0, datetime(2023, 6, 15, 14, 37)),
            # arrival -1 min, departure missing
            _tu_row("t1", 3, "300", datetime(2023, 6, 15, 14, 29), EPOCH0),
            # both missing (kept: schedule epochs >> 60000s makes WHERE a no-op)
            _tu_row("t1", 4, "400", EPOCH0, EPOCH0),
            # leading-zero stop_id string still matches via cast
            _tu_row("t2", 1, "007", datetime(2023, 6, 15, 14, 31), datetime(2023, 6, 15, 14, 36)),
            # no schedule partner → dropped
            _tu_row("t8", 1, "800", datetime(2023, 6, 15, 14, 0), datetime(2023, 6, 15, 14, 1)),
        ],
        TRIP_UPDATES,
    )
    df = compute_delays(tu, gd)
    rows = {(r["trip_id"], r["stop_sequence"]): r for r in df.collect()}
    return df, rows


def test_columns_and_rowcount(result):
    df, rows = result
    assert df.columns == TRIP_UPDATES_WITH_DIFFS_COLUMNS
    assert set(rows) == {("t1", 1), ("t1", 2), ("t1", 3), ("t1", 4), ("t2", 1)}


def test_both_present(result):
    r = result[1][("t1", 1)]
    assert r["arrival_time_diff_in_minutes"] == 5.0
    assert r["departure_time_diff_in_minutes"] == -3.0
    assert r["average_diff_in_minutes"] == 1.0  # (300 - 180) / 120
    assert r["actual_arrival_time"] == datetime(2023, 6, 15, 14, 35)


def test_arrival_missing_asymmetry(result):
    r = result[1][("t1", 2)]
    assert r["actual_arrival_time"] is None  # sentinel → NULL for the time
    assert r["arrival_time_diff_in_minutes"] == 0.0  # but 0.0 for the diff
    assert r["average_diff_in_minutes"] == 2.0  # departure-only branch


def test_departure_missing(result):
    r = result[1][("t1", 3)]
    assert r["actual_departure_time"] is None
    assert r["departure_time_diff_in_minutes"] == 0.0
    assert r["average_diff_in_minutes"] == -1.0  # arrival-only branch


def test_both_missing(result):
    r = result[1][("t1", 4)]
    assert r["actual_arrival_time"] is None and r["actual_departure_time"] is None
    assert r["arrival_time_diff_in_minutes"] == 0.0
    assert r["departure_time_diff_in_minutes"] == 0.0
    assert r["average_diff_in_minutes"] is None  # 4th branch


def test_stop_id_cast_join(result):
    r = result[1][("t2", 1)]
    assert r["stop_id"] == 7  # "007" cast to bigint matched stop 7
    assert r["arrival_time_diff_in_minutes"] == 1.0


def test_local_slicing_columns(result):
    r = result[1][("t1", 1)]
    assert r["day_type"] == "Thursday"
    assert r["sudbury_hour_of_day"] == 10  # 14:30 UTC = 10:30 EDT
    assert r["geo_coordinates"] == "46.5, -81.0"
