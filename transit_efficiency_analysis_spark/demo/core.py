"""Core projection / filter / scalar-expression demos (SURVEY.md §2.2).

Each demo re-expresses one reference operator over the driver's testdata
tables, with an exact DuckDB twin. Determinism notes:
- doubles that feed aggregates are cast to DECIMAL before summing elsewhere;
  here expressions are row-local so doubles are bit-equal across engines.
- formatted strings use printf-style patterns on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.time import null_if_sentinel
from transit_efficiency_analysis_spark.functions.weather import (
    kelvin_to_celsius,
    weather_group_for_id,
)
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_proj_select",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj-select: narrow column projection (pruned at the parquet scan)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@demo(
    "q_proj_rename",
    sql="""
    SELECT o_orderkey AS order_id, CAST(o_orderdate AS DATE) AS start_date,
           o_totalprice AS total_price
    FROM orders
    """,
)
def q_proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj-rename: column rename (reference renames date → start_date)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .withColumnRenamed("o_orderkey", "order_id")
        .withColumn("start_date", F.to_date("o_orderdate"))
        .drop("o_orderdate")
        .withColumnRenamed("o_totalprice", "total_price")
        .select("order_id", "start_date", "total_price")
    )


@demo(
    "q_proj_concat",
    sql="""
    SELECT c_custkey,
           c_name || ', ' || c_mktsegment AS name_segment,
           printf('%.2f, %.2f', c_acctbal, c_acctbal * 2) AS geo_style
    FROM customer
    """,
)
def q_proj_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proj-concat: derived string columns (the geo_coordinates pattern —
    reference ``historical_extractor.py:78``); printf-format keeps float
    rendering identical across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws(", ", F.col("c_name"), F.col("c_mktsegment")).alias("name_segment"),
        # *2 is exact in binary, so the shortest decimal repr stays 2-digit and
        # Java's %.2f (rounds shortest repr) agrees with C's (rounds exact value)
        F.format_string("%.2f, %.2f", F.col("c_acctbal"), F.col("c_acctbal") * 2).alias(
            "geo_style"
        ),
    )


@demo(
    "q_filter_entity",
    sql="""
    SELECT event_id, user_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE props IS NOT NULL
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def q_filter_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-entity: predicate on (semi-structured) field presence — the
    keep-entities-with-trip_update pattern (``realtime_extractor.py:103``),
    here over the JSON ``props`` column."""
    e = load_table(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.where(F.col("props").isNotNull() & (prop_k > 50))
        .select("event_id", "user_id", "event_type", prop_k.alias("prop_k"))
    )


@demo(
    "q_filter_sentinel",
    sql="""
    SELECT event_id, user_id, value
    FROM events
    WHERE NOT ((value <= 20 AND user_id % 3 = 0) AND (value <= 50 AND event_id % 2 = 0))
    """,
)
def q_filter_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-sentinel: the reference's compound NOT predicate shape
    (``diff_times.py:102-106``)."""
    e = load_table(spark, sf_dir, "events")
    v, u, i = F.col("value"), F.col("user_id"), F.col("event_id")
    return e.where(~(((v <= 20) & (u % 3 == 0)) & ((v <= 50) & (i % 2 == 0)))).select(
        "event_id", "user_id", "value"
    )


@demo(
    "q_case_null",
    sql="""
    SELECT event_id,
           CASE WHEN epoch(ts2) = 0 THEN NULL ELSE ts2 END AS actual_ts
    FROM (
        SELECT event_id,
               CASE WHEN event_id % 10 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                    ELSE ts END AS ts2
        FROM events
    )
    """,
)
def q_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case-null: epoch-0 sentinel → NULL (``diff_times.py:51-54``)."""
    e = load_table(spark, sf_dir, "events")
    ts2 = F.when(F.col("event_id") % 10 == 0, F.timestamp_seconds(F.lit(0))).otherwise(
        F.col("ts")
    )
    return e.select("event_id", null_if_sentinel(ts2).alias("actual_ts"))


@demo(
    "q_case_diff",
    sql="""
    SELECT event_id,
           CASE WHEN epoch(actual) = 0 THEN 0.0
                ELSE (epoch(actual) - epoch(sched)) / 60 END AS diff_in_minutes
    FROM (
        SELECT event_id,
               date_trunc('hour', ts) AS sched,
               CASE WHEN event_id % 10 = 0 THEN TIMESTAMP '1970-01-01 00:00:00'
                    ELSE ts END AS actual
        FROM events
    )
    """,
)
def q_case_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case-diff: sentinel → 0.0 (not NULL), else minutes diff
    (``diff_times.py:56-59`` — the asymmetric branch)."""
    e = load_table(spark, sf_dir, "events")
    sched = F.date_trunc("hour", F.col("ts"))
    actual = F.when(F.col("event_id") % 10 == 0, F.timestamp_seconds(F.lit(0))).otherwise(
        F.col("ts")
    )
    diff = F.when(actual.cast("double") == 0, F.lit(0.0)).otherwise(
        (actual.cast("double") - sched.cast("double")) / 60.0
    )
    return e.select("event_id", diff.alias("diff_in_minutes"))


@demo(
    "q_case_avg",
    sql="""
    SELECT event_id,
           CASE
               WHEN a <> 0 AND b <> 0 THEN (a + b) / 120.0
               WHEN a = 0 AND b <> 0 THEN b / 60.0
               WHEN a <> 0 AND b = 0 THEN a / 60.0
               ELSE NULL
           END AS avg_diff
    FROM (
        SELECT event_id,
               CAST(CASE WHEN event_id % 3 = 0 THEN 0 ELSE event_id % 7 END AS DOUBLE) AS a,
               CAST(CASE WHEN event_id % 5 = 0 THEN 0 ELSE event_id % 11 END AS DOUBLE) AS b
        FROM events
    )
    """,
)
def q_case_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case-avg: the 4-branch average (``diff_times.py:69-78``)."""
    e = load_table(spark, sf_dir, "events")
    i = F.col("event_id")
    a = F.when(i % 3 == 0, F.lit(0)).otherwise(i % 7).cast("double")
    b = F.when(i % 5 == 0, F.lit(0)).otherwise(i % 11).cast("double")
    avg = (
        F.when((a != 0) & (b != 0), (a + b) / 120.0)
        .when((a == 0) & (b != 0), b / 60.0)
        .when((a != 0) & (b == 0), a / 60.0)
        .otherwise(F.lit(None).cast("double"))
    )
    return e.select("event_id", avg.alias("avg_diff"))


@demo(
    "q_case_bucket",
    sql="""
    SELECT event_id, wid AS weather_id,
           CASE
               WHEN wid BETWEEN 200 AND 299 THEN 'Thunderstorm'
               WHEN wid BETWEEN 300 AND 399 THEN 'Drizzle'
               WHEN wid BETWEEN 500 AND 599 THEN 'Rain'
               WHEN wid BETWEEN 600 AND 699 THEN 'Snow'
               WHEN wid BETWEEN 700 AND 799 THEN 'Atmosphere'
               WHEN wid = 800 THEN 'Clear'
               WHEN wid BETWEEN 801 AND 899 THEN 'Clouds'
               ELSE 'Unknown' END AS weather_group
    FROM (SELECT event_id, CAST(200 + event_id % 605 AS INTEGER) AS wid FROM events)
    """,
)
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case-bucket: OpenWeatherMap id → coarse group
    (``realtime_extractor.py:69-84``)."""
    e = load_table(spark, sf_dir, "events")
    wid = (F.lit(200) + F.col("event_id") % 605).cast("int")
    return e.select(
        "event_id", wid.alias("weather_id"), weather_group_for_id(wid).alias("weather_group")
    )


@demo(
    "q_expr_math",
    sql="""
    SELECT event_id, value + 250 AS kelvin, (value + 250) - 273.15 AS celsius
    FROM events
    """,
)
def q_expr_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr-math: Kelvin → Celsius (``realtime_extractor.py:64-67``)."""
    e = load_table(spark, sf_dir, "events")
    kelvin = F.col("value") + 250
    return e.select("event_id", kelvin.alias("kelvin"), kelvin_to_celsius(kelvin).alias("celsius"))


@demo(
    "q_expr_cast",
    sql="""
    SELECT event_id,
           CAST(user_id AS VARCHAR) AS user_id_str,
           CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS user_id_back,
           CAST(floor(value) AS BIGINT) AS value_long
    FROM events
    """,
)
def q_expr_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expr-cast: string↔bigint casts (the ``tu.stop_id::bigint`` pattern,
    ``diff_times.py:47,101``). Note: double→bigint rounds half-even in both
    engines (Spark follows ANSI cast-to-integral truncation? — no: Spark
    CAST(double AS BIGINT) truncates toward zero, DuckDB rounds; so we cast
    via floor() to pin identical semantics)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").cast("string").alias("user_id_str"),
        F.col("user_id").cast("string").cast("long").alias("user_id_back"),
        F.floor("value").cast("long").alias("value_long"),
    )


@demo(
    "q_null_surface",
    sql="""
    SELECT event_id,
           coalesce(props, '{}') AS props_or_empty,
           nullif(event_type, 'click') AS type_unless_click,
           CASE WHEN props IS NOT NULL THEN 'has_props' ELSE 'no_props' END AS props_flag,
           (value IS NULL) AS value_missing,
           ifnull(value, -1.0) AS value_or_default
    FROM events
    """,
)
def q_null_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce / nullif / nvl2-style flag /
    IS NULL / default substitution — the sentinel-and-null vocabulary the
    reference leans on (epoch-0 defaults, NULL-suppressed updates)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce("props", F.lit("{}")).alias("props_or_empty"),
        F.nullif("event_type", F.lit("click")).alias("type_unless_click"),
        F.when(F.col("props").isNotNull(), "has_props")
        .otherwise("no_props")
        .alias("props_flag"),
        F.col("value").isNull().alias("value_missing"),
        F.ifnull("value", F.lit(-1.0)).alias("value_or_default"),
    )


@demo(
    "q_expr_try_arith",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity / (l_linenumber - 1) AS DOUBLE)
           END AS qty_per_prior_line,
           CASE WHEN l_linenumber - 4 = 0 THEN NULL
                ELSE l_orderkey // (l_linenumber - 4) END AS int_div,
           CASE WHEN l_linenumber - 4 = 0 THEN NULL
                ELSE l_orderkey % (l_linenumber - 4) END AS int_mod
    FROM lineitem
    """,
)
def q_expr_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode — ``try_divide`` /
    ``try_mod``: Spark 4 runs ANSI by default, where ``x / 0`` is a
    RUNTIME ERROR that kills the job, and the ``try_*`` family is the
    sanctioned way to get NULL-on-error semantics per expression
    instead of globally disabling ANSI. The divisors here genuinely
    hit zero (line numbers 1..7 minus constants), so every NULL in the
    output is a real division-by-zero the ``try_`` absorbed; the
    oracle states the explicit CASE guard the function replaces.
    Integer div/mod NULL semantics pinned alongside the fractional
    divide. Pure map-side expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    # try_divide returns a fractional result; the truncating cast after
    # it matches DuckDB's integer ``//`` (both truncate toward zero —
    # probed: 7 // -2 = -3 on both engines, not floor's -4)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") - 1)
        .cast("double")
        .alias("qty_per_prior_line"),
        F.try_divide(F.col("l_orderkey"), F.col("l_linenumber") - 4)
        .cast("long")
        .alias("int_div"),
        F.try_mod(F.col("l_orderkey"), F.col("l_linenumber") - 4)
        .cast("long")
        .alias("int_mod"),
    )
