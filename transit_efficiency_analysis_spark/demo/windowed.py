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
