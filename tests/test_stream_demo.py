"""The streaming catch-up demo must be genuinely incremental AND equal
the batch recompute (its oracle proves value equality; here we pin the
multi-batch structure and schema)."""

from __future__ import annotations

from transit_efficiency_analysis_spark.demo import streamingdemo
from transit_efficiency_analysis_spark.demo.streamingdemo import q_stream_daily_agg


def test_stream_runs_multiple_batches_and_matches_batch_agg(spark, sf_dir):
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.functions.parity import parity_double
    from transit_efficiency_analysis_spark.sources.registry import load_table

    got = q_stream_daily_agg(spark, sf_dir)
    # one data-carrying micro-batch per feed file: the stream accumulated
    # state across triggers rather than degenerate single-batch replay
    assert streamingdemo._LAST_RUN_BATCHES[0] >= 4

    e = load_table(spark, sf_dir, "events")
    want = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            parity_double(
                F.sum(F.col("value").cast("decimal(18,6)")), 6
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    key = lambda r: (r.window_start, r.event_type)
    got_rows = sorted(got.collect(), key=key)
    want_rows = sorted(want.collect(), key=key)
    assert got_rows == want_rows


def test_append_mode_emits_exactly_the_closed_windows(spark, sf_dir):
    """Append + watermark: emitted once, closed windows only, the open
    last-day window held in state — vs the batch recompute restricted to
    window_end <= max(ts) - 1h (the final watermark)."""
    import datetime

    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.demo.streamingdemo import (
        q_stream_daily_agg_append,
    )
    from transit_efficiency_analysis_spark.functions.parity import parity_double
    from transit_efficiency_analysis_spark.sources.registry import load_table

    got = q_stream_daily_agg_append(spark, sf_dir)
    # >= 4 data batches in run 1 + 2 sentinel batches in run 2
    assert streamingdemo._LAST_APPEND_BATCHES[0] >= 6

    # emit-once across the checkpoint restart: no duplicate windows
    dups = (
        got.groupBy("window_start", "event_type")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dups == 0

    e = load_table(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).first()[0]
    watermark = max_ts - datetime.timedelta(hours=1)
    want = (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            parity_double(
                F.sum(F.col("value").cast("decimal(18,6)")), 6
            ).alias("sum_value"),
        )
        .where(F.col("w.end") <= F.lit(watermark))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    key = lambda r: (r.window_start, r.event_type)
    got_rows = sorted(got.collect(), key=key)
    want_rows = sorted(want.collect(), key=key)
    assert got_rows == want_rows
    # the open window really was held back
    open_days = {r.window_start for r in got_rows}
    assert max_ts.replace(hour=0, minute=0, second=0, microsecond=0) not in open_days
