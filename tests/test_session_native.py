"""session_window boundary semantics + native/lag-based equivalence.

The native session demo's oracle encodes a probed contract: a gap of
EXACTLY the session gap MERGES (the session interval is
``[first_ts, last_ts + gap)``), strictly greater splits. These tests pin
that probe so a Spark-version change in the boundary rule fails CI
instead of silently red-rowing the oracle, and prove the native
aggregate equals the lag-flag formulation event-for-event.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import load_registry


def test_session_window_boundary_rule(spark):
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:30:00"),  # == gap
        (2, "2024-01-01 10:00:00"), (2, "2024-01-01 10:29:59"),  # < gap
        (3, "2024-01-01 10:00:00"), (3, "2024-01-01 10:30:01"),  # > gap
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    got = {r["user_id"]: r["n_sessions"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}, (
        "session_window boundary rule changed: exact-gap must merge, "
        f"strictly-greater must split; got {got}"
    )


def test_native_sessions_match_lag_based(spark, sf_dir):
    """q_window_session_native == q_window_session up to the documented
    session_end convention (native: last_ts + gap; lag-based: last_ts)
    and the session_id column the native form doesn't materialize."""
    import datetime

    reg = load_registry()
    native = sorted(
        (r["user_id"], r["session_start"],
         r["session_end"] - datetime.timedelta(minutes=30), r["n_events"])
        for r in reg["q_window_session_native"].fn(spark, sf_dir).collect()
    )
    lag = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in reg["q_window_session"].fn(spark, sf_dir).collect()
    )
    assert native == lag
