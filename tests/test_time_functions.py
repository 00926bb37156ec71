"""Golden tests for the signature time functions (FIXTURES.md §5 hot spots).

Covers: >= 24 h GTFS clock rollover, DST spring-forward/fall-back at the
America/Toronto boundary, sentinel helpers, local-time extractors.
Expected values hand-computed (Toronto is UTC-5 EST / UTC-4 EDT).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.functions.time import (
    epoch_minutes_diff,
    gtfs_time_to_utc,
    is_epoch0,
    local_day_name,
    local_hour,
    null_if_sentinel,
)


def _gtfs(spark, date_str: str, time_str: str) -> datetime:
    df = spark.createDataFrame([(date_str, time_str)], "d string, t string")
    return df.select(gtfs_time_to_utc("d", "t").alias("ts")).collect()[0]["ts"]


def test_plain_time(spark):
    # 2023-06-15 (EDT, UTC-4): 10:30 local → 14:30 UTC
    assert _gtfs(spark, "20230615", "10:30:00") == datetime(2023, 6, 15, 14, 30)


def test_rollover_past_midnight(spark):
    # 25:15 on D means D+1 01:15 local (historical_extractor.py:31-32 semantics)
    # 2023-06-15 25:15 → 2023-06-16 01:15 EDT → 05:15 UTC
    assert _gtfs(spark, "20230615", "25:15:00") == datetime(2023, 6, 16, 5, 15)


def test_double_rollover(spark):
    # 49:00 → D+2 01:00 local
    assert _gtfs(spark, "20230615", "49:00:00") == datetime(2023, 6, 17, 5, 0)


def test_winter_offset(spark):
    # 2023-01-15 (EST, UTC-5): 08:00 local → 13:00 UTC
    assert _gtfs(spark, "20230115", "08:00:00") == datetime(2023, 1, 15, 13, 0)


def test_dst_spring_forward(spark):
    # 2023-03-12: clocks jump 02:00→03:00 EST→EDT.
    # 01:59 local is still EST (UTC-5) → 06:59 UTC
    assert _gtfs(spark, "20230312", "01:59:00") == datetime(2023, 3, 12, 6, 59)
    # 03:00 local is EDT (UTC-4) → 07:00 UTC
    assert _gtfs(spark, "20230312", "03:00:00") == datetime(2023, 3, 12, 7, 0)
    # rollover across the gap: service date 03-11, clock 26:30 → 03-12 02:30
    # local, a nonexistent wall time; java.time shifts by the gap → 03:30 EDT
    # → 07:30 UTC (the reference's pandas tz_localize would raise here)
    assert _gtfs(spark, "20230311", "26:30:00") == datetime(2023, 3, 12, 7, 30)


def test_dst_fall_back(spark):
    # 2023-11-05: clocks fall back 02:00→01:00 EDT→EST; 01:30 is ambiguous —
    # java.time resolves to the earlier (EDT, UTC-4) offset → 05:30 UTC
    assert _gtfs(spark, "20231105", "01:30:00") == datetime(2023, 11, 5, 5, 30)
    # 03:00 is unambiguous EST → 08:00 UTC
    assert _gtfs(spark, "20231105", "03:00:00") == datetime(2023, 11, 5, 8, 0)


def test_sentinel_helpers(spark):
    df = spark.createDataFrame(
        [(datetime(1970, 1, 1, 0, 0), datetime(2023, 6, 15, 12, 0))], "a timestamp, b timestamp"
    )
    row = df.select(
        is_epoch0("a").alias("a0"),
        is_epoch0("b").alias("b0"),
        null_if_sentinel("a").alias("an"),
        null_if_sentinel("b").alias("bn"),
        epoch_minutes_diff("b", "a").alias("dm"),
    ).collect()[0]
    assert row["a0"] is True and row["b0"] is False
    assert row["an"] is None and row["bn"] == datetime(2023, 6, 15, 12, 0)
    assert row["dm"] == (datetime(2023, 6, 15, 12, 0) - datetime(1970, 1, 1)).total_seconds() / 60


def test_local_extractors(spark):
    # 2023-06-15 23:30 UTC → 19:30 EDT Thursday
    df = spark.createDataFrame([(datetime(2023, 6, 15, 23, 30),)], "ts timestamp")
    row = df.select(
        local_day_name("ts").alias("d"), local_hour("ts").alias("h")
    ).collect()[0]
    assert row["d"] == "Thursday" and row["h"] == 19
    # 2023-01-16 03:30 UTC → 22:30 EST Sunday Jan 15
    df2 = spark.createDataFrame([(datetime(2023, 1, 16, 3, 30),)], "ts timestamp")
    row2 = df2.select(
        local_day_name("ts").alias("d"), local_hour("ts").alias("h")
    ).collect()[0]
    assert row2["d"] == "Sunday" and row2["h"] == 22


def test_codegen_no_python_udf(spark):
    """The signature function must stay JVM-side (no BatchEvalPython in plan)."""
    df = spark.createDataFrame([("20230615", "25:15:00")], "d string, t string")
    plan = df.select(gtfs_time_to_utc("d", "t"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
