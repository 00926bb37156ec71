"""dropDuplicatesWithinWatermark semantics: first-wins emit, duplicate
suppression within the horizon, state EVICTION once the watermark passes
first-seen + delay (after which the key is legitimately re-emitted), and
the foreachBatch upsert demo's batch-split-invariant convergence."""

from __future__ import annotations

import os
import time
from datetime import datetime

import pytest
from pyspark.sql import functions as F

_SCHEMA = "user_id long, event_type string, ts timestamp"


def _feed(spark, path, seq):
    """Write each element of ``seq`` as its own file with strictly
    increasing mtimes, so the file source processes them in order."""
    t0 = time.time() - 3600
    for i, rows in enumerate(seq):
        fdir = os.path.join(path, f"b{i}")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(fdir)
    # order every data file by its batch index
    import glob

    n = 0
    for i in range(len(seq)):
        for p in sorted(glob.glob(os.path.join(path, f"b{i}", "part-*"))):
            os.utime(p, (t0 + n, t0 + n))
            n += 1


@pytest.mark.slow
def test_dedup_within_watermark_eviction_and_reemission(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    h = lambda hh, mm=0: datetime(2026, 1, 1, hh, mm)  # noqa: E731
    _feed(
        spark,
        feed,
        [
            # b0: key (1,a) first seen at 10:00 -> emitted
            [(1, "a", h(10, 0))],
            # b1: duplicate at 10:30, within the 1h horizon -> dropped;
            # (2,b) at 13:00 advances the watermark to 12:00 for b2
            [(1, "a", h(10, 30)), (2, "b", h(13, 0))],
            # b2: runs with watermark 12:00 > first-seen(1,a)+1h = 11:00;
            # (1,a) state is evicted at this batch's END (eviction is a
            # batch-boundary action, so a same-batch re-arrival would
            # still be deduplicated — hence the extra batch here)
            [(3, "c", h(13, 10))],
            # b3: the 13:30 re-arrival finds no state -> re-emitted
            [(1, "a", h(13, 30))],
        ],
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(feed, "*"))
    )
    dedup = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "ts")
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["event_type"], r["ts"])
        for r in spark.sql("SELECT * FROM dedup_wm").collect()
    )
    spark.catalog.dropTempView("dedup_wm")
    assert got == [
        (1, "a", h(10, 0)),   # first emit wins (10:30 duplicate dropped)
        (1, "a", h(13, 30)),  # re-emitted AFTER eviction
        (2, "b", h(13, 0)),
        (3, "c", h(13, 10)),
    ]


@pytest.mark.slow
def test_stream_upsert_foreachbatch_converges_to_batch_dedup(spark, sf_dir):
    from transit_efficiency_analysis_spark.demo import streamingdemo
    from transit_efficiency_analysis_spark.demo.streamingdemo import (
        q_stream_upsert_foreachbatch,
    )
    from transit_efficiency_analysis_spark.operators.upsert import (
        upsert_keep_newest,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    got = q_stream_upsert_foreachbatch(spark, sf_dir)
    # one data-carrying micro-batch per feed file: the table was built by
    # a genuine stream of merges, not a single-shot rewrite
    assert streamingdemo._LAST_UPSERT_BATCHES[0] >= 4

    want = upsert_keep_newest(
        load_table(spark, sf_dir, "events"),
        keys=["user_id", "event_type"],
        order_by=["ts", "event_id"],
    ).select("event_id", "ts", "user_id", "event_type", "value")
    key = lambda r: (r.user_id, r.event_type)  # noqa: E731
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
