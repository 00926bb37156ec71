"""End-to-end pipeline test: schedule ingest → two realtime polls →
consolidation, asserting delay arithmetic on the final table. This is the
whole reference system (three cron scripts + two databases) as three calls.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from transit_efficiency_analysis_spark import schemas
from transit_efficiency_analysis_spark.pipeline import (
    Store,
    consolidate,
    ingest_realtime,
    ingest_schedule,
)

CSVS = {
    "stop_times": """trip_id,arrival_time,departure_time,stop_id,stop_sequence
T1,10:30:00,10:31:00,100,1
T1,10:45:00,10:46:00,200,2
""",
    "trips": "trip_id,service_id,route_id\nT1,S1,R1\n",
    "calendar_dates": "service_id,date\nS1,20230615\n",
    "stops": "stop_id,stop_name,stop_lat,stop_lon\n100,Downtown,46.49,-80.99\n200,Uptown,46.52,-81.01\n",
    "routes": "route_id,route_long_name\nR1,Main Line\n",
}

# scheduled arrivals (UTC): stop1 14:30, stop2 14:45 (EDT +4)
ARR1 = int(datetime(2023, 6, 15, 14, 30).timestamp())
ARR2 = int(datetime(2023, 6, 15, 14, 45).timestamp())


def _feed(spark, poll_ts, updates):
    return spark.createDataFrame(
        [(poll_ts, [("T1", "20230615", updates)])], schemas.REALTIME_FEED_RAW
    )


@pytest.mark.slow
def test_full_pipeline(spark, tmp_path):
    csv_dir = tmp_path / "gtfs"
    csv_dir.mkdir()
    for name, content in CSVS.items():
        (csv_dir / f"{name}.txt").write_text(content)
    store = Store(str(tmp_path / "store"))

    gd = ingest_schedule(spark, str(csv_dir), store)
    assert gd.count() == 2

    # poll 1: stop 1 running 2 min late; poll 2 revises to 3 min late and
    # adds stop 2 on time
    ingest_realtime(
        spark,
        _feed(spark, datetime(2023, 6, 15, 14, 0), [(1, "100", ARR1 + 120, ARR1 + 180)]),
        store,
        weather=(801, "few clouds", 293.15),
    )
    tu = ingest_realtime(
        spark,
        _feed(
            spark,
            datetime(2023, 6, 15, 14, 5),
            [(1, "100", ARR1 + 180, ARR1 + 240), (2, "200", ARR2, None)],
        ),
        store,
        weather=(801, "few clouds", 293.15),
    )
    assert tu.count() == 2  # keep-newest collapsed the two stop-1 polls

    diffs = consolidate(spark, store)
    rows = {r["stop_sequence"]: r for r in diffs.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["arrival_time_diff_in_minutes"] == 3.0  # newest poll won
    assert rows[2]["arrival_time_diff_in_minutes"] == 0.0
    # stop 2 had no departure → epoch-0 default → NULL actual, 0.0 diff
    assert rows[2]["actual_departure_time"] is None
    assert rows[2]["departure_time_diff_in_minutes"] == 0.0
    assert rows[1]["weather_group"] == "Clouds"
    assert abs(rows[1]["temperature"] - 20.0) < 1e-9
    assert rows[1]["day_type"] == "Thursday"
    assert rows[1]["sudbury_hour_of_day"] == 10


@pytest.mark.slow
def test_audit_columns_from_injected_wallclock(spark, tmp_path):
    """ts-now production path (reference realtime_extractor.py:185,234):
    created_at/updated_at come from the processing wall clock — injected
    here for determinism, ``current_timestamp()`` in production — with the
    conditional-update suppression: an unchanged poll leaves the stored
    row's weather AND updated_at untouched."""
    csv_dir = tmp_path / "gtfs"
    csv_dir.mkdir()
    for name, content in CSVS.items():
        (csv_dir / f"{name}.txt").write_text(content)
    store = Store(str(tmp_path / "store"))
    ingest_schedule(spark, str(csv_dir), store)

    n1 = datetime(2023, 6, 15, 14, 0, 11)
    n2 = datetime(2023, 6, 15, 14, 5, 22)
    n3 = datetime(2023, 6, 15, 14, 10, 33)
    upd = [(1, "100", ARR1 + 120, ARR1 + 180)]

    # poll 1: insert → created_at = n1, updated_at NULL
    tu = ingest_realtime(
        spark,
        _feed(spark, datetime(2023, 6, 15, 14, 0), upd),
        store,
        weather=(800, "clear sky", 290.15),
        now=n1,
    )
    r = tu.collect()[0]
    assert r["created_at"] == n1 and r["updated_at"] is None

    # poll 2: identical times, NEW weather → suppressed: everything kept
    tu = ingest_realtime(
        spark,
        _feed(spark, datetime(2023, 6, 15, 14, 5), upd),
        store,
        weather=(501, "moderate rain", 280.15),
        now=n2,
    )
    r = tu.collect()[0]
    assert r["weather_group"] == "Clear"        # old weather retained
    assert r["created_at"] == n1 and r["updated_at"] is None

    # poll 3: arrival revised → update fires: new weather, updated_at = n3
    tu = ingest_realtime(
        spark,
        _feed(spark, datetime(2023, 6, 15, 14, 10), [(1, "100", ARR1 + 300, ARR1 + 360)]),
        store,
        weather=(600, "light snow", 270.15),
        now=n3,
    )
    r = tu.collect()[0]
    assert r["weather_group"] == "Snow"
    assert r["created_at"] == n1                # first-insert stamp immutable
    assert r["updated_at"] == n3                # last real change

    # production default: current_timestamp() → a real, recent stamp
    store2 = Store(str(tmp_path / "store2"))
    ingest_schedule(spark, str(csv_dir), store2)
    tu = ingest_realtime(spark, _feed(spark, datetime(2023, 6, 15, 14, 0), upd), store2)
    r = tu.collect()[0]
    assert r["created_at"] is not None and r["created_at"] > datetime(2026, 1, 1)


@pytest.mark.slow
def test_incremental_consolidation_equals_full(spark, tmp_path):
    from datetime import date

    from transit_efficiency_analysis_spark.pipeline import consolidate_incremental

    csv_dir = tmp_path / "gtfs"
    csv_dir.mkdir()
    csvs = dict(CSVS)
    # two service dates → two diffs partitions
    csvs["calendar_dates"] = "service_id,date\nS1,20230615\nS1,20230616\n"
    for name, content in csvs.items():
        (csv_dir / f"{name}.txt").write_text(content)
    store = Store(str(tmp_path / "store"))
    ingest_schedule(spark, str(csv_dir), store)

    arr1_d2 = ARR1 + 86400  # same local clock on the next service date
    ingest_realtime(
        spark,
        _feed(spark, datetime(2023, 6, 15, 14, 0), [(1, "100", ARR1 + 60, None)]),
        store,
    )
    ingest_realtime(
        spark,
        _feed_on(spark, datetime(2023, 6, 16, 14, 0), "20230616", [(1, "100", arr1_d2 + 300, None)]),
        store,
    )
    full = consolidate(spark, store)
    full_rows = sorted(map(str, full.collect()))

    # a revision arrives for day 2 only → incremental rebuild of that date
    ingest_realtime(
        spark,
        _feed_on(spark, datetime(2023, 6, 16, 14, 5), "20230616", [(1, "100", arr1_d2 + 600, None)]),
        store,
    )
    inc = consolidate_incremental(spark, store, [date(2023, 6, 16)])
    inc_rows = sorted(map(str, inc.collect()))

    # ground truth: full rebuild over the updated store
    truth = sorted(map(str, consolidate(spark, store).collect()))
    assert inc_rows == truth
    assert inc_rows != full_rows  # the day-2 revision actually changed things


def _feed_on(spark, poll_ts, date_str, updates):
    return spark.createDataFrame(
        [(poll_ts, [("T1", date_str, updates)])], schemas.REALTIME_FEED_RAW
    )
