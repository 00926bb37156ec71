"""Driver-checkable Structured Streaming demo.

The streaming family (SURVEY §2's ``src-state-json`` successor: checkpointed
micro-batch ingest, watermarked windowed aggregation, stateful upsert) has
so far been pytest-only — streams have no one-shot SQL twin *while
running*. This demo closes that gap with the one contract that IS
oracle-checkable: a bounded catch-up run. ``Trigger.AvailableNow`` over a
static file source processes every pending file and stops, and a
complete-mode windowed aggregation then equals the batch recompute
EXACTLY — which a DuckDB oracle can verify. The equality is the
correctness claim that matters for the production path too: it is the
replay/backfill guarantee (a stream restarted over the full history
converges to the batch answer).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table

# per-invocation memory-sink names: a fixed queryName would collide if two
# demo invocations ever ran concurrently on one SparkSession (each start()
# registers the sink as a temp view under its queryName)
_RUN_SEQ = [0]


def _sink_name(prefix: str) -> str:
    _RUN_SEQ[0] += 1
    return f"{prefix}_{_RUN_SEQ[0]}"


@demo(
    "q_stream_daily_agg",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def q_stream_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming daily event rollup, verified against the batch answer:
    ``readStream`` over the events parquet -> 1-day tumbling-window
    aggregation -> memory sink, run with ``Trigger.AvailableNow`` (process
    everything pending, then stop — the catch-up/backfill trigger). The
    result table must equal the batch GROUP BY bit-for-bit (counts are
    integers, sums go through the DECIMAL(18,6) parity cast), proving the
    streaming operator is a sound incremental evaluation of the same
    logical plan. At 100 TB the same query runs unbounded with
    ``withWatermark`` + append mode against a file/Kafka source and the
    sink becomes a partitioned table; complete-mode-into-memory is the
    bounded harness that makes today's run deterministic and
    hash-checkable."""
    # land the events as a 4-file feed directory (the one-drop-per-poll
    # shape realtime_stream.py ingests); maxFilesPerTrigger=1 then forces
    # FOUR micro-batches, so the run genuinely exercises incremental
    # state accumulation, not a single-batch degenerate case
    batch = load_table(spark, sf_dir, "events")
    feed_dir = tempfile.mkdtemp(prefix="stream_demo_feed_")
    batch.repartitionByRange(4, "event_id").write.mode("overwrite").parquet(
        feed_dir
    )
    events = (
        spark.readStream.format("parquet")
        .schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .load(feed_dir)
    )
    agg = (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
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
    sink = _sink_name("stream_daily_events")
    try:
        with tempfile.TemporaryDirectory(prefix="stream_demo_ckpt_") as ckpt:
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # data-carrying micro-batches this run (tests pin >= 4: one
            # per feed file, so the run was genuinely incremental)
            _LAST_RUN_BATCHES[0] = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            q.stop()
        # materialize off the memory sink (bounded: days x event types)
        # before the temp feed/checkpoint dirs vanish
        rows = spark.table(sink)
        out = spark.createDataFrame(rows.collect(), rows.schema)
        spark.catalog.dropTempView(sink)
        return out
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)


#: observability for tests: data-carrying batch count of the last run
_LAST_RUN_BATCHES = [0]
