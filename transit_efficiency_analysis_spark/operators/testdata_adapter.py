"""Deterministic GTFS-shaped views over the driver's TPC-H-ish testdata.

The driver's oracle runs on ``orders/lineitem/events`` parquet (TESTDATA.md),
not on GTFS feeds — so the flagship delay pipeline is demoed on synthetic
``gtfs_data`` / ``trip_updates`` tables derived *deterministically* from
``orders ⋈ lineitem``. Every derivation below is a pure column expression
with an exact ANSI-SQL twin (``GD_SQL`` / ``TU_SQL``) so the DuckDB oracle
reproduces it bit-for-bit.

Mapping: an order is a "trip", its lineitems are "stops". ``l_shipdate`` is
the scheduled arrival; actual times are the schedule plus a key-derived
jitter, with the epoch-0 missing sentinel injected on ``l_orderkey`` residue
classes (matching the reference's missing-time convention,
``README.md:131-132``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.functions.weather import weather_group_for_id

#: fixed audit timestamp (ts-now is injected as a constant for determinism)
CREATED_AT = "2026-01-01 00:00:00"


def _shift_seconds(ts, secs):
    """ts + secs, via the unix domain (testdata timestamps are whole-second)."""
    return F.timestamp_seconds(F.unix_timestamp(ts) + secs)


def gtfs_data_view(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Schedule side: orders ⋈ lineitem → ``schemas.GTFS_DATA`` shape."""
    j = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
    return j.select(
        F.col("o_orderkey").cast("string").alias("trip_id"),
        F.to_date("o_orderdate").alias("start_date"),
        F.col("l_linenumber").cast("long").alias("stop_sequence"),
        F.col("l_partkey").alias("stop_id"),
        F.col("l_returnflag").alias("route_id"),
        F.concat(F.lit("stop_"), F.col("l_suppkey").cast("string")).alias("stop_name"),
        F.col("o_orderpriority").alias("route_long_name"),
        F.col("l_shipdate").alias("arrival_time"),
        _shift_seconds(F.col("l_shipdate"), F.lit(300)).alias("departure_time"),
        F.format_string(
            "%.4f, %.4f",
            F.col("l_discount") * 1000 - 50,
            F.col("l_tax") * 1000 - 80,
        ).alias("geo_coordinates"),
    )


GD_SQL = """
SELECT
    CAST(o_orderkey AS VARCHAR)               AS trip_id,
    CAST(o_orderdate AS DATE)                 AS start_date,
    CAST(l_linenumber AS BIGINT)              AS stop_sequence,
    l_partkey                                 AS stop_id,
    l_returnflag                              AS route_id,
    'stop_' || CAST(l_suppkey AS VARCHAR)     AS stop_name,
    o_orderpriority                           AS route_long_name,
    l_shipdate                                AS arrival_time,
    l_shipdate + INTERVAL 300 SECOND          AS departure_time,
    printf('%.4f, %.4f', l_discount * 1000 - 50, l_tax * 1000 - 80) AS geo_coordinates
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def trip_updates_view(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Realtime side: same keys, jittered actuals, sentinel injection,
    weather enrichment → ``schemas.TRIP_UPDATES`` shape (stop_id as STRING)."""
    j = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
    k = F.col("l_orderkey")
    epoch0 = F.timestamp_seconds(F.lit(0))
    arr = F.when(k % 11 == 0, epoch0).otherwise(
        _shift_seconds(F.col("l_shipdate"), (k % 13 - 6) * 60)
    )
    dep = F.when(k % 7 == 0, epoch0).otherwise(
        _shift_seconds(F.col("l_shipdate"), 300 + (k % 9 - 4) * 60)
    )
    weather_id = (F.lit(200) + F.col("l_partkey") % 605).cast("int")
    return j.select(
        F.col("o_orderkey").cast("string").alias("trip_id"),
        F.to_date("o_orderdate").alias("start_date"),
        F.col("l_linenumber").cast("long").alias("stop_sequence"),
        F.col("l_partkey").cast("string").alias("stop_id"),
        arr.alias("arrival_time"),
        dep.alias("departure_time"),
        weather_group_for_id(weather_id).alias("weather_group"),
        F.lower(weather_group_for_id(weather_id)).alias("weather_description"),
        F.round(F.col("l_quantity") + 280 - 273.15, 2).alias("temperature"),
        F.to_timestamp(F.lit(CREATED_AT)).alias("created_at"),
        F.lit(None).cast("timestamp").alias("updated_at"),
    )


TU_SQL = f"""
SELECT
    CAST(o_orderkey AS VARCHAR)  AS trip_id,
    CAST(o_orderdate AS DATE)    AS start_date,
    CAST(l_linenumber AS BIGINT) AS stop_sequence,
    CAST(l_partkey AS VARCHAR)   AS stop_id,
    CASE WHEN l_orderkey % 11 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
         ELSE l_shipdate + to_seconds(((l_orderkey % 13) - 6) * 60) END AS arrival_time,
    CASE WHEN l_orderkey % 7 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
         ELSE l_shipdate + to_seconds(300 + ((l_orderkey % 9) - 4) * 60) END AS departure_time,
    CASE
        WHEN 200 + l_partkey % 605 BETWEEN 200 AND 299 THEN 'Thunderstorm'
        WHEN 200 + l_partkey % 605 BETWEEN 300 AND 399 THEN 'Drizzle'
        WHEN 200 + l_partkey % 605 BETWEEN 500 AND 599 THEN 'Rain'
        WHEN 200 + l_partkey % 605 BETWEEN 600 AND 699 THEN 'Snow'
        WHEN 200 + l_partkey % 605 BETWEEN 700 AND 799 THEN 'Atmosphere'
        WHEN 200 + l_partkey % 605 = 800 THEN 'Clear'
        WHEN 200 + l_partkey % 605 BETWEEN 801 AND 899 THEN 'Clouds'
        ELSE 'Unknown' END AS weather_group,
    lower(CASE
        WHEN 200 + l_partkey % 605 BETWEEN 200 AND 299 THEN 'Thunderstorm'
        WHEN 200 + l_partkey % 605 BETWEEN 300 AND 399 THEN 'Drizzle'
        WHEN 200 + l_partkey % 605 BETWEEN 500 AND 599 THEN 'Rain'
        WHEN 200 + l_partkey % 605 BETWEEN 600 AND 699 THEN 'Snow'
        WHEN 200 + l_partkey % 605 BETWEEN 700 AND 799 THEN 'Atmosphere'
        WHEN 200 + l_partkey % 605 = 800 THEN 'Clear'
        WHEN 200 + l_partkey % 605 BETWEEN 801 AND 899 THEN 'Clouds'
        ELSE 'Unknown' END) AS weather_description,
    round(l_quantity + 280 - 273.15, 2) AS temperature,
    TIMESTAMP '{CREATED_AT}'     AS created_at,
    CAST(NULL AS TIMESTAMP)      AS updated_at
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""
