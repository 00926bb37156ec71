"""Watermarked windowed streaming aggregation: late data within the
watermark is folded in; a final AvailableNow pass equals the batch window
aggregate (the append-mode late-data contract)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


@pytest.mark.slow
def test_watermarked_window_agg_matches_batch(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    h = lambda hh, mm=0: datetime(2026, 1, 1, hh, mm)  # noqa: E731
    # batch 1: events in hours 10 and 11
    _write_batch(spark, feed, [(1, h(10, 5), 1.0), (1, h(10, 40), 2.0), (2, h(11, 10), 4.0)])
    # batch 2: a LATE event for hour 10 (arrives after hour-11 data) + hour 12
    _write_batch(spark, feed, [(1, h(10, 55), 8.0), (1, h(12, 1), 16.0)])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("total"))
        .select(F.col("w.start").alias("ws"), "user_id", "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_agg")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["ws"], r["user_id"]): float(r["total"])
        for r in spark.sql("SELECT * FROM wm_agg").collect()
    }
    # the late hour-10 event (value 8.0, within the 2h watermark) must be folded in
    assert got[(h(10), 1)] == 11.0  # 1 + 2 + 8
    assert got[(h(11), 2)] == 4.0
    assert got[(h(12), 1)] == 16.0

    # equals the batch recompute of the same window aggregate
    batch = (
        spark.read.schema("user_id long, ts timestamp, value double")
        .parquet(feed)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("total"))
        .select(F.col("w.start").alias("ws"), "user_id", "total")
    )
    want = {(r["ws"], r["user_id"]): float(r["total"]) for r in batch.collect()}
    assert got == want
