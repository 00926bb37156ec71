"""Stream-stream watermarked interval join (SURVEY.md §5.4 extension).

Two unbounded sources — trip updates and vehicle positions — joined on
trip_id within an event-time interval. Both sides carry watermarks plus a
time-range join condition, which is exactly what lets Spark BOUND the join
state: rows older than (watermark − interval) are evicted instead of
accumulating forever — the property that makes the join runnable against
an infinite feed at 100 TB/day. The streamed result must equal the plain
batch join over the same files.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

_UPD_SCHEMA = "trip_id string, upd_ts timestamp, eta_s long"
_POS_SCHEMA = "trip_id string, pos_ts timestamp, stop_dist_m long"


def _write(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _interval_join(upd, pos):
    """Inner join: position reports within [upd_ts − 2 min, upd_ts + 5 min)
    of an update for the same trip."""
    return upd.join(
        pos,
        (upd.trip_id == pos.trip_id)
        & (pos.pos_ts >= upd.upd_ts - F.expr("INTERVAL 2 MINUTES"))
        & (pos.pos_ts < upd.upd_ts + F.expr("INTERVAL 5 MINUTES")),
    ).select(upd.trip_id, "upd_ts", "eta_s", "pos_ts", "stop_dist_m")


@pytest.mark.slow
def test_stream_stream_interval_join(spark, tmp_path):
    upd_dir, pos_dir = str(tmp_path / "upd"), str(tmp_path / "pos")
    ckpt = str(tmp_path / "ckpt_ssj")
    t = lambda m: datetime(2026, 1, 1, 12, m)

    _write(spark, upd_dir, _UPD_SCHEMA, [("T1", t(0), 120), ("T2", t(1), 300)])
    _write(
        spark,
        pos_dir,
        _POS_SCHEMA,
        [
            ("T1", t(1), 500),   # in [11:58, 12:05) → matches
            ("T1", t(20), 90),   # far outside the interval → dropped
            ("T2", t(0), 800),   # in [11:59, 12:06) → matches
            ("T3", t(1), 700),   # no update for T3 → dropped
        ],
    )

    upd = (
        spark.readStream.schema(_UPD_SCHEMA)
        .parquet(upd_dir)
        .withWatermark("upd_ts", "10 minutes")
    )
    pos = (
        spark.readStream.schema(_POS_SCHEMA)
        .parquet(pos_dir)
        .withWatermark("pos_ts", "10 minutes")
    )
    q = (
        _interval_join(upd, pos)
        .writeStream.format("memory")
        .queryName("ssj_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def tuples(df):
        return sorted(
            (r["trip_id"], str(r["upd_ts"]), r["eta_s"], str(r["pos_ts"]), r["stop_dist_m"])
            for r in df.collect()
        )

    got = tuples(spark.sql("SELECT * FROM ssj_sink"))
    want = tuples(
        _interval_join(
            spark.read.schema(_UPD_SCHEMA).parquet(upd_dir),
            spark.read.schema(_POS_SCHEMA).parquet(pos_dir),
        )
    )
    assert got == want
    assert [g[0] for g in got] == ["T1", "T2"]


@pytest.mark.slow
def test_stream_stream_left_outer_join_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """LEFT OUTER stream-stream join: an update with no position report
    can only be emitted null-padded once the watermark proves no match
    can still arrive — so the null row needs a LATER batch to advance
    event time past (upd_ts + interval + watermark). State is evicted on
    the same clock, which is what bounds an infinite feed's join state."""
    upd_dir, pos_dir = str(tmp_path / "upd_lo"), str(tmp_path / "pos_lo")
    t = lambda m: datetime(2026, 1, 1, 12, m)

    _write(spark, upd_dir, _UPD_SCHEMA, [("T1", t(0), 120), ("T2", t(1), 300)])
    _write(spark, pos_dir, _POS_SCHEMA, [("T1", t(1), 500)])  # T2 never reports

    def run(name):
        # one file per micro-batch: outer-join eviction uses the watermark
        # computed from the PREVIOUS batch, so the null-padded row can only
        # surface in a batch after the one that advanced event time
        upd = (
            spark.readStream.schema(_UPD_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(upd_dir)
            .withWatermark("upd_ts", "10 minutes")
        )
        pos = (
            spark.readStream.schema(_POS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(pos_dir)
            .withWatermark("pos_ts", "10 minutes")
        )
        j = upd.join(
            pos,
            (upd.trip_id == pos.trip_id)
            & (pos.pos_ts >= upd.upd_ts - F.expr("INTERVAL 2 MINUTES"))
            & (pos.pos_ts < upd.upd_ts + F.expr("INTERVAL 5 MINUTES")),
            "left_outer",
        ).select(upd.trip_id, "upd_ts", "eta_s", "pos_ts", "stop_dist_m")
        q = (
            j.writeStream.format("memory")
            .queryName(name)
            # memory sinks can't recover a checkpoint; each run gets its
            # own and replays the full feed (AvailableNow), which is the
            # semantics under test: what the watermark lets it emit
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["trip_id"], r["stop_dist_m"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    first = run("ssj_lo1")
    assert ("T1", 500) in first
    assert ("T2", None) not in first, (
        "null-padded row emitted before the watermark could prove no match"
    )

    # the GLOBAL watermark is the min over both sources, so BOTH feeds
    # must advance past T2's interval end; a trailing pos file then gives
    # the post-advance batch in which the evicted T2 row surfaces
    _write(spark, upd_dir, _UPD_SCHEMA, [("T9", t(50), 1)])
    _write(spark, pos_dir, _POS_SCHEMA, [("T9", t(59), 1)])
    _write(spark, pos_dir, _POS_SCHEMA, [("T9", t(59), 2)])
    second = run("ssj_lo2")
    assert ("T2", None) in second
    assert ("T1", 500) in second
