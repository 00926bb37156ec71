"""Date/time function demos (SURVEY.md §2.3) with exact DuckDB twins.

The signature demo is ``q_ts_gtfs_parse``: GTFS >=24h clock strings built
deterministically from orders keys, parsed with ``gtfs_time_to_utc``.
Synthetic clock hours avoid the 01:00-02:59 local band so DST-nonexistent/
ambiguous wall times (where java.time and ICU disagree-by-convention) never
occur; the engine's own DST behavior is pinned by golden tests instead
(tests/test_time_functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.time import (
    gtfs_time_to_utc,
    local_day_name,
    local_hour,
    to_local,
    unix_to_utc,
    yyyymmdd_to_date,
)
from transit_efficiency_analysis_spark.sources.registry import load_table

# Toronto-safe synthetic clock: non-rollover hours 3..23, rollover 24/27/30
_HOUR_SQL = "CASE WHEN o_orderkey % 5 = 0 THEN 24 + (o_orderkey % 3) * 3 ELSE 3 + (o_orderkey % 21) END"
_MIN_SQL = "o_orderkey % 60"


def _hour_col():
    k = F.col("o_orderkey")
    return F.when(k % 5 == 0, 24 + (k % 3) * 3).otherwise(3 + (k % 21))


@demo(
    "q_ts_gtfs_parse",
    sql=f"""
    SELECT o_orderkey,
           date_str, time_str,
           timezone('UTC', timezone('America/Toronto',
               make_timestamp(
                   CAST(year(rolled) AS BIGINT), CAST(month(rolled) AS BIGINT),
                   CAST(day(rolled) AS BIGINT),
                   CAST(h % 24 AS BIGINT), CAST(m AS BIGINT), 0.0)
           )) AS utc_ts
    FROM (
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y%m%d') AS date_str,
               printf('%02d:%02d:00', h, m) AS time_str,
               CAST(o_orderdate AS DATE) + to_days(CAST(h // 24 AS INTEGER)) AS rolled,
               h, m
        FROM (SELECT o_orderkey, o_orderdate,
                     {_HOUR_SQL} AS h, {_MIN_SQL} AS m
              FROM orders)
    )
    """,
)
def q_ts_gtfs_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-gtfs-parse: the signature scalar function — GTFS clock (H may be
    >= 24) + yyyyMMdd date → UTC instant (``historical_extractor.py:26-37``)."""
    o = load_table(spark, sf_dir, "orders")
    h, m = _hour_col(), F.col("o_orderkey") % 60
    date_str = F.date_format("o_orderdate", "yyyyMMdd")
    time_str = F.format_string("%02d:%02d:00", h, m)
    return o.select(
        "o_orderkey",
        date_str.alias("date_str"),
        time_str.alias("time_str"),
        gtfs_time_to_utc(date_str, time_str).alias("utc_ts"),
    )


@demo(
    "q_ts_unix",
    sql="""
    SELECT event_id,
           TIMESTAMP '1970-01-01 00:00:00' + to_seconds(800000000 + event_id * 977) AS utc_ts
    FROM events
    """,
)
def q_ts_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-unix: epoch seconds → UTC timestamp (``realtime_extractor.py:107``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", unix_to_utc(F.lit(800000000) + F.col("event_id") * 977).alias("utc_ts")
    )


@demo(
    "q_ts_date_parse",
    sql="""
    SELECT o_orderkey,
           CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS start_date
    FROM orders
    """,
)
def q_ts_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-date-parse: yyyyMMdd string → DATE (``historical_extractor.py:30,74``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        yyyymmdd_to_date(F.date_format("o_orderdate", "yyyyMMdd")).alias("start_date"),
    )


@demo(
    "q_ts_epoch",
    sql="""
    SELECT event_id, CAST(epoch(ts) AS DOUBLE) AS epoch_seconds
    FROM events
    """,
)
def q_ts_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-epoch: EXTRACT(EPOCH FROM ts) (``diff_times.py:52`` etc.)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", F.col("ts").cast("double").alias("epoch_seconds"))


@demo(
    "q_ts_sub_min",
    sql="""
    SELECT event_id,
           (epoch(ts) - epoch(date_trunc('day', ts))) / 60 AS minutes_into_day
    FROM events
    """,
)
def q_ts_sub_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-sub-min: timestamp subtraction → fractional minutes
    (``diff_times.py:58,67``)."""
    e = load_table(spark, sf_dir, "events")
    diff = (
        F.col("ts").cast("double") - F.date_trunc("day", F.col("ts")).cast("double")
    ) / 60.0
    return e.select("event_id", diff.alias("minutes_into_day"))


@demo(
    "q_ts_dow_name",
    sql="""
    SELECT event_id,
           dayname(timezone('America/Toronto', timezone('UTC', ts))) AS day_type
    FROM events
    """,
)
def q_ts_dow_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-dow-name: local-tz day name — one expression replaces the
    reference's 7-branch CASE (``diff_times.py:82-90``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", local_day_name("ts").alias("day_type"))


@demo(
    "q_ts_hour_local",
    sql="""
    SELECT event_id,
           CAST(hour(timezone('America/Toronto', timezone('UTC', ts))) AS INTEGER)
               AS local_hour
    FROM events
    """,
)
def q_ts_hour_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-hour-local: local-tz hour of day (``diff_times.py:91``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", local_hour("ts").alias("local_hour"))


@demo(
    "q_ts_tz_localize",
    sql="""
    SELECT event_id,
           timezone('America/Toronto', timezone('UTC', ts)) AS toronto_wall
    FROM events
    WHERE hour(ts) NOT BETWEEN 5 AND 8
    """,
)
def q_ts_tz_localize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts-tz-localize: UTC instant → local wall clock
    (inverse of ``historical_extractor.py:35-37``). The filter skips UTC
    hours that could map into the 01:00-02:59 Toronto band where DST edge
    conventions differ between java.time and ICU."""
    e = load_table(spark, sf_dir, "events")
    return e.where(~F.hour("ts").between(5, 8)).select(
        "event_id", to_local("ts").alias("toronto_wall")
    )


#: Fixed batch clock for the driver demo — SURVEY §2.3 (ts-now) prescribes
#: injecting a fixed value for determinism; production stamping passes
#: ``now=None`` to use the live wall clock instead.
_AUDIT_CLOCK = "2026-08-13 12:00:00"


def q_ts_now_audit_impl(
    spark: SparkSession, sf_dir: str, now: str | None = _AUDIT_CLOCK
) -> DataFrame:
    """ts-now: audit-column stamping with one clock value per batch
    (reference ``realtime_extractor.py:185,234`` / ``diff_times.py:25``
    stamp every row of a poll with a single ``now()``). ``now=None`` uses
    the live ``current_timestamp()`` — which Spark evaluates once per
    query, exactly the reference's single-``now()``-per-poll semantics;
    the driver demo injects :data:`_AUDIT_CLOCK` so the result is
    deterministic and oracle-checkable (the ``single_stamp`` column proves
    the one-stamp-per-batch invariant either way)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    clock = (
        F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
    )
    stamped = o.select(
        "o_orderkey",
        clock.alias("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
    )
    return stamped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # per-query constant: min == max across every row of the batch
        (F.min("created_at") == F.max("created_at")).alias("single_stamp"),
        F.max("created_at").alias("stamp"),
        F.count("updated_at").alias("n_updated"),  # inserts carry NULL
    )


demo(
    "q_ts_now_audit",
    sql=f"""
    SELECT count(*) AS n_rows,
           min(created_at) = max(created_at) AS single_stamp,
           max(created_at) AS stamp,
           count(updated_at) AS n_updated
    FROM (
        SELECT o_orderkey,
               TIMESTAMP '{_AUDIT_CLOCK}' AS created_at,
               CAST(NULL AS TIMESTAMP) AS updated_at
        FROM orders
        WHERE o_orderkey <= 1000
    )
    """,
)(q_ts_now_audit_impl)


@demo(
    "q_ts_calendar",
    sql="""
    SELECT event_id,
           last_day(CAST(ts AS DATE)) AS month_end,
           CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
           CAST(dayofyear(CAST(ts AS DATE)) AS INTEGER) AS doy,
           CAST(quarter(CAST(ts AS DATE)) AS INTEGER) AS qtr,
           CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS INTEGER)
               AS days_since_epoch0
    FROM events
    """,
)
def q_ts_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: ``last_day`` (billing-period end),
    ``add_months`` (the month-add with end-of-month clamping both
    engines share: Jan 31 + 1 month = Feb 29), ``dayofyear``,
    ``quarter``, and day-difference from a fixed anchor. All pure date
    expressions fused into the scan; the oracle states each with
    DuckDB's spelling (interval add vs ``add_months`` — same clamping
    semantics, which is exactly what the hash pins)."""
    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return e.select(
        "event_id",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 1).alias("next_month"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
    )
