"""Stream/batch parity for incremental aggregate maintenance: events
staged as three micro-batch files, drained with Trigger.AvailableNow and
merged as partial-aggregate monoids, must equal the one-pass batch
aggregate bit-for-bit. A re-run after a late fourth file must process
ONLY the new file (checkpoint) and still match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo.analytics import incremental_maintenance
from transit_efficiency_analysis_spark.streaming.agg_maintenance import (
    final_aggregate,
    run_agg_maintenance_stream,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_streamed_maintenance_equals_batch(spark, sf_dir, tmp_path):
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # three disjoint date slices staged as separate micro-batch files
    cuts = ("2024-01-08", "2024-01-20")
    slices = [
        events.filter(F.to_date("ts") < cuts[0]),
        events.filter(
            (F.to_date("ts") >= cuts[0]) & (F.to_date("ts") < cuts[1])
        ),
        events.filter(F.to_date("ts") >= cuts[1]),
    ]
    for s in slices[:3]:
        s.coalesce(1).write.mode("append").parquet(feed)

    run_agg_maintenance_stream(spark, feed, state, ckpt)
    got = _canon(final_aggregate(spark, state))
    want = _canon(incremental_maintenance(events))
    assert got == want

    # late re-delivery: duplicate-shaped new observations for a key subset
    late = events.filter(F.col("user_id") < 5)
    late.coalesce(1).write.mode("append").parquet(feed)
    run_agg_maintenance_stream(spark, feed, state, ckpt)  # resumes from ckpt
    got2 = _canon(final_aggregate(spark, state))
    want2 = _canon(incremental_maintenance(events.unionByName(late)))
    assert got2 == want2
