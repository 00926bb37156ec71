"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState``.

The reference has no stateful stream processing (its 'state' is a JSON
rate-limit file, SURVEY §1.1.5) — this is the engine capability a realtime
delay pipeline needs at scale: per-trip running statistics maintained
incrementally across micro-batches with bounded state, instead of
recomputing from the full history every 10 minutes.

The operator keeps (count, sum, max_ts) per key and emits the updated
aggregate each time a batch touches the key. State timeout is
``GroupStateTimeout.NoTimeout`` here (testdata is bounded); a production
deployment sets an event-time timeout + watermark so state for idle trips
is evicted.

Proven by a stream/batch parity test (tests/test_stateful_streaming.py):
replaying the events table through N micro-batches yields exactly the
batch groupBy aggregate.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, total DOUBLE, max_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total, max_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        # math.fsum: exact rounded sum, independent of batch/row order —
        # keeps the parity test bit-stable against the batch recompute
        import math

        total = math.fsum([total] + list(pdf["value"].dropna()))
        batch_max = pdf["ts"].max()
        if max_ts is None or (batch_max is not pd.NaT and batch_max > max_ts):
            max_ts = batch_max
    state.update((n, float(total), max_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [float(total)],
            "last_ts": [max_ts],
        }
    )


def running_user_aggregates(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame (events schema) → per-key updated aggregates."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream(
    spark: SparkSession, feed_dir: str, checkpoint_dir: str, query_name: str
) -> None:
    """Run the stateful aggregate over all staged event files (AvailableNow),
    collecting updates into an in-memory sink table named ``query_name``."""
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed_dir)
    q = (
        running_user_aggregates(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
