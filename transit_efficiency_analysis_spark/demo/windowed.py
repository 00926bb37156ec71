"""Time-windowed aggregation demos: tumbling windows and gap-based
sessionization over the events stream table.

These are the batch twins of the Structured Streaming windowed/stateful
operators (a streaming query over the same expressions needs only
``readStream`` + a watermark). Sessionization is the classic
lag-gap → cumulative-sum islands construction — integer arithmetic only,
so it is exactly portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_window_tumbling",
    sql="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tumbling 1-hour windows via ``F.window`` (the streaming window
    operator, here in batch) — flattened to start/end columns."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            parity_double(F.sum(F.col("value").cast("decimal(18,6)")), 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_GAP_MIN = 30


@demo(
    "q_window_session",
    sql=f"""
    SELECT user_id, session_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events
    FROM (
        SELECT user_id, ts,
               CAST(sum(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL THEN 1
                        WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                             ORDER BY ts, event_id))
                             > {_SESSION_GAP_MIN} * 60 THEN 1
                        ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gap-based sessionization (30 min inactivity → new session):
    lag-gap flags → running sum session ids → per-session aggregates.
    The batch twin of ``session_window``/``applyInPandasWithState``."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double"))
    is_new = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_s > _SESSION_GAP_MIN * 60, 1)
        .otherwise(0)
    )
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@demo(
    "q_window_session_native",
    sql=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id))
                         > {_SESSION_GAP_MIN} * 60 THEN 1
                    ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(max(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE AS TIMESTAMP)
               AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` — the same
    30-min-gap contract as ``q_window_session`` (lag-flag + running sum),
    proven equivalent through the independent lag-based oracle. The
    built-in is the streaming-ready form (merging session state,
    watermark eviction — ``q_stream_sessionize_append`` runs this exact
    aggregate unbounded); in batch it compiles to one key shuffle + sort
    with the merge done inside the aggregate, no second window pass for
    the running session-id sum. Boundary semantics pinned by probe and
    test: a gap of EXACTLY the session gap merges (the window end is
    ``last_ts + gap``, exclusive), strictly-greater splits — hence the
    oracle's strict ``>``. ``session_end`` is ``last_ts + gap`` (the
    eviction horizon), not ``max(ts)`` as in ``q_window_session`` — both
    conventions exist in the wild; the pair documents the difference."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@demo(
    "q_ts_gapfill_ffill",
    sql="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               count(*) AS n_obs,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                    AS DOUBLE) AS day_value
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
        SELECT user_id,
               min(CAST(ts AS DATE)) AS d0,
               max(CAST(ts AS DATE)) AS d1
        FROM events
        GROUP BY user_id
    ),
    spine AS (
        SELECT s.user_id, CAST(g.d AS DATE) AS day
        FROM spans s,
             LATERAL unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS g(d)
    )
    SELECT sp.user_id, sp.day,
           coalesce(d.n_obs, 0) AS n_obs,
           (d.day_value IS NULL) AS is_filled,
           last_value(d.day_value IGNORE NULLS)
               OVER (PARTITION BY sp.user_id ORDER BY sp.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value
    FROM spine sp LEFT JOIN daily d USING (user_id, day)
    """,
)
def q_ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + forward fill (the GTFS-RT feed-outage
    repair shape: a vehicle feed that goes dark for a day still needs a
    dense per-day series for downstream joins and dashboards).

    Two shuffles, only one proportional to event volume (plan-audited):

    1. per-(user, day) aggregate (map-side partial agg, exact decimal)
       — the only exchange that scales with events; its OUTPUT is
       bounded by #keys x #days, so the planner broadcasts it into the
       spine join (observed at test scale; at worst AQE shuffles the
       equally-bounded spine);
    2. a per-user shuffle for the min/max span aggregate; the spine
       explode (``sequence(min_day, max_day)``) is a map op that
       PRESERVES that partitioning, so the fill window
       (``last(value, ignorenulls=True)`` over unbounded-preceding
       rows) adds no further exchange.

    The spine starts at each user's first observed day, so the fill
    column has no leading NULLs; ``is_filled`` marks repaired rows.
    """
    return gapfill_ffill(load_table(spark, sf_dir, "events"))


def gapfill_ffill(e: DataFrame) -> DataFrame:
    """Operator body of ``q_ts_gapfill_ffill`` over any events-shaped
    frame (user_id, ts, value) — reused by the scale harness."""
    day = F.to_date("ts").alias("day")
    daily = e.groupBy("user_id", day).agg(
        F.count(F.lit(1)).alias("n_obs"),
        parity_double(F.sum(F.col("value").cast("decimal(18,6)")), 6).alias(
            "day_value"
        ),
    )
    spans = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.col("day_value").isNull().alias("is_filled"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@demo(
    "q_window_ohlc",
    sql="""
    SELECT DISTINCT
           date_trunc('hour', ts) AS bucket,
           event_type,
           first_value(value) OVER w AS open,
           max(value) OVER w AS high,
           min(value) OVER w AS low,
           last_value(value) OVER w AS close,
           CAST(count(*) OVER w AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (
        PARTITION BY date_trunc('hour', ts), event_type
        ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q_window_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time-series downsample to OHLC bars (open/high/low/close per hour
    per series) — the resample shape every metrics store runs. Spark side
    is ONE aggregation pass with struct-ordered min/max picking open and
    close (min/max over struct(ts, event_id, value) — event_id breaks ts
    ties, so the bar is deterministic under any partitioning), NO window
    sort: the shuffle carries one 5-field row per (bucket, series) from
    each map partition. The oracle takes the classical windowed-SQL
    route (first_value/last_value over an ordered frame) — two
    independent algorithms, one hash."""
    e = load_table(spark, sf_dir, "events")
    ordered = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.min(ordered).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(ordered).getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
