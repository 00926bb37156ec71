"""Streaming twin of the OHLC downsample: the same struct-ordered
min/max aggregation runs as a watermarked windowed streaming aggregate
and, after an AvailableNow drain, matches the batch bars exactly —
including a bar revised by late-but-within-watermark data."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _ohlc_agg(df):
    ordered = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return df.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.min(ordered).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(ordered).getField("value").alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


@pytest.mark.slow
def test_streaming_ohlc_matches_batch(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    h = lambda hh, mm: datetime(2026, 2, 1, hh, mm)  # noqa: E731
    _write_batch(
        spark,
        feed,
        [(1, h(9, 5), 10.0), (2, h(9, 30), 50.0), (3, h(9, 50), 20.0), (4, h(10, 10), 7.0)],
    )
    # late event re-opens the 9:00 bar: EARLIER ts than the current open,
    # so open/low must be revised; also extends hour 10
    _write_batch(spark, feed, [(5, h(9, 1), 3.0), (6, h(10, 40), 9.0)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        _ohlc_agg(stream.withWatermark("ts", "3 hours"))
        .select(F.col("w.start").alias("ws"), "open", "high", "low", "close", "n_events")
        .writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["ws"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in spark.sql("SELECT * FROM ohlc_stream").collect()
    }
    # hour 9 bar after the late revision: open=3 (09:01), close=20 (09:50)
    assert got[h(9, 0)] == (3.0, 50.0, 3.0, 20.0, 4)
    assert got[h(10, 0)] == (7.0, 9.0, 7.0, 9.0, 2)

    # bars equal the batch recompute over the full feed
    batch = {
        r["ws"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in _ohlc_agg(spark.read.parquet(feed))
        .select(F.col("w.start").alias("ws"), "open", "high", "low", "close", "n_events")
        .collect()
    }
    assert got == batch
