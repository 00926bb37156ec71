"""Parity test for the applyInPandasWithState running-aggregate operator:
the LAST update emitted per key across all micro-batches must equal the
batch groupBy recompute."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.sources.registry import load_table
from transit_efficiency_analysis_spark.streaming.stateful import run_stateful_stream


@pytest.mark.slow
def test_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    feed = str(tmp_path / "feed")
    # stage as 3 files → 3 micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        events.where(F.col("event_id") % 3 == i).coalesce(1).write.mode("append").parquet(feed)

    run_stateful_stream(spark, feed, str(tmp_path / "ckpt"), "stateful_updates")
    updates = spark.sql("SELECT * FROM stateful_updates")
    # the operator emits one update per touched key per batch; final state =
    # the row with the max n_events per key (counts grow monotonically)
    final = {
        r["user_id"]: r
        for r in updates.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .collect()
    }

    batch = {
        r["user_id"]: r
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.collect_list("value").alias("vals"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert f["n_events"] == b["n_events"]
        assert f["last_ts"] == b["last_ts"]
        # fsum in the operator is order-exact; compare against fsum here too
        assert f["total_value"] == pytest.approx(math.fsum(b["vals"]), rel=1e-12)
