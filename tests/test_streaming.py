"""Stream/batch parity test (SURVEY.md §5.4).

Stage N poll files, run the AvailableNow stream (foreachBatch → merge), and
assert the final state table equals the one-shot batch recompute. Then add
a late re-delivery poll and re-run: checkpointing skips processed files,
the new poll upserts, and parity still holds.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from transit_efficiency_analysis_spark import schemas
from transit_efficiency_analysis_spark.streaming.realtime_stream import (
    batch_equivalent,
    run_stream_available_now,
)


def _poll(spark, path, poll_ts, entities):
    df = spark.createDataFrame([(poll_ts, entities)], schemas.REALTIME_FEED_RAW)
    df.coalesce(1).write.mode("append").parquet(path)


def _state_tuples(df):
    return sorted(
        (r["trip_id"], str(r["start_date"]), r["stop_sequence"], r["stop_id"],
         str(r["arrival_time"]), str(r["departure_time"]), str(r["poll_ts"]))
        for r in df.collect()
    )


@pytest.mark.slow
def test_stream_equals_batch(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    t0 = datetime(2026, 1, 1, 12, 0)
    t1 = datetime(2026, 1, 1, 12, 1)
    # poll 1: two stops for T1
    _poll(spark, feed_dir, t0, [("T1", "20260101", [(1, "100", 1767268800, None),
                                                    (2, "200", 1767268900, 1767268960)])])
    # poll 2: stop 1 ETA revised; new trip T2
    _poll(spark, feed_dir, t1, [("T1", "20260101", [(1, "100", 1767268860, None)]),
                                ("T2", "20260101", [(1, "300", None, 1767269000)])])

    run_stream_available_now(spark, feed_dir, state, ckpt)
    got = _state_tuples(spark.read.parquet(state))
    want = _state_tuples(batch_equivalent(spark, feed_dir))
    assert got == want
    # newest ETA for (T1, seq 1) won
    assert any("2026-01-01 12:01" in t[6] for t in got if t[0] == "T1" and t[2] == 1)

    # late poll 3: re-delivery of an older-looking update for T2 + a revision
    t2 = datetime(2026, 1, 1, 12, 2)
    _poll(spark, feed_dir, t2, [("T2", "20260101", [(1, "300", 1767269100, 1767269160)])])
    run_stream_available_now(spark, feed_dir, state, ckpt)  # resumes from checkpoint
    got2 = _state_tuples(spark.read.parquet(state))
    want2 = _state_tuples(batch_equivalent(spark, feed_dir))
    assert got2 == want2
    assert len(got2) == 3  # still one row per PK


@pytest.mark.slow
def test_dedup_stream_within_watermark(spark, tmp_path):
    """At-least-once re-deliveries die in-stream with BOUNDED state:
    the same (PK, poll_ts) row staged in two different feed files must
    reach the sink once; a genuinely new poll_ts for the same PK passes
    (semantic keep-newest is merge_batch's job, not the dedup's)."""
    from transit_efficiency_analysis_spark.streaming.realtime_stream import (
        dedup_stream_within_watermark,
        transform_feed,
    )

    feed_dir = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt_dedup")
    t0 = datetime(2026, 1, 1, 12, 0)
    t1 = datetime(2026, 1, 1, 12, 1)
    entities = [("T1", "20260101", [(1, "100", 1767268800, None)])]
    _poll(spark, feed_dir, t0, entities)
    _poll(spark, feed_dir, t0, entities)  # exact re-delivery, second file
    _poll(spark, feed_dir, t1, entities)  # new poll of the same PK

    raw = spark.readStream.schema(schemas.REALTIME_FEED_RAW).parquet(feed_dir)
    rows = dedup_stream_within_watermark(transform_feed(raw))
    q = (
        rows.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["trip_id"], r["stop_sequence"], str(r["poll_ts"]))
        for r in spark.sql("SELECT * FROM dedup_sink").collect()
    )
    assert got == [
        ("T1", 1, "2026-01-01 12:00:00"),
        ("T1", 1, "2026-01-01 12:01:00"),
    ]


@pytest.mark.slow
def test_stream_static_join_enrichment(spark, tmp_path):
    """Stream-static join: the micro-batch stream enriched against a
    static dimension (the schedule) must emit exactly what the batch
    join emits — Spark re-plans the static side per micro-batch, so the
    dim may be broadcast without freezing its contents into the
    checkpoint."""
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.streaming.realtime_stream import (
        transform_feed,
    )
    from transit_efficiency_analysis_spark import schemas

    feed_dir = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt_enrich")
    t0 = datetime(2026, 1, 1, 12, 0)
    _poll(spark, feed_dir, t0, [("T1", "20260101", [(1, "100", 1767268800, None)]),
                                ("T2", "20260101", [(1, "300", None, 1767269000)])])
    dim = spark.createDataFrame(
        [("100", "Main St"), ("300", "Elm Ave")], "stop_id string, stop_name string"
    )

    raw = spark.readStream.schema(schemas.REALTIME_FEED_RAW).parquet(feed_dir)
    enriched = transform_feed(raw).join(F.broadcast(dim), "stop_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["trip_id"], r["stop_id"], r["stop_name"])
        for r in spark.sql("SELECT * FROM enrich_sink").collect()
    )
    batch = transform_feed(
        spark.read.schema(schemas.REALTIME_FEED_RAW).parquet(feed_dir)
    ).join(F.broadcast(dim), "stop_id", "left")
    want = sorted(
        (r["trip_id"], r["stop_id"], r["stop_name"]) for r in batch.collect()
    )
    assert got == want and ("T1", "100", "Main St") in got
