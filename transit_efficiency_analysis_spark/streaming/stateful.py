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
    # Normalize a legacy NaT persisted by a pre-guard checkpoint ONCE, up
    # front: if every later chunk is all-null the fold below never touches
    # max_ts, and re-persisting/emitting NaT would diverge from the batch
    # F.max recompute (NULL) — ADVICE r10.
    max_ts = None if pd.isna(max_ts) else max_ts
    for pdf in pdfs:
        n += len(pdf)
        # math.fsum: exact rounded sum, independent of batch/row order —
        # keeps the parity test bit-stable against the batch recompute
        import math

        total = math.fsum([total] + list(pdf["value"].dropna()))
        # An all-null chunk yields batch_max = NaT. Never assign NaT into
        # max_ts: NaT comparisons are always False, so a NaT state would
        # ignore every later real timestamp and silently diverge from the
        # batch F.max('ts') recompute (which skips nulls) — ADVICE r9.
        batch_max = pdf["ts"].max()
        if not pd.isna(batch_max) and (
            max_ts is None or pd.isna(max_ts) or batch_max > max_ts
        ):
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


# --- Spark 4 successor API: transformWithStateInPandas ----------------------
#
# The new arbitrary-stateful-processing API (SPARK-49564 umbrella): a
# StatefulProcessor object with named state variables (value/list/map
# state, timers, TTL) instead of one opaque state tuple, requiring the
# RocksDB state store provider. Functionally this operator is the twin of
# ``running_user_aggregates`` above, and the parity contract is the same:
# final update per key == the batch groupBy recompute
# (tests/test_stateful_streaming.py).
#
# Environment note: the TWS Python worker speaks a protobuf protocol to
# the JVM (`pyspark/sql/streaming/proto/StateMessage_pb2`), so it needs
# the `google.protobuf` package at STREAM RUNTIME. This container ships
# no protobuf (the reason sources/gtfs_rt_wire.py exists); the parity
# test skips with an inverse probe — same documented pattern as the
# spark-protobuf-jar skip in tests/test_ingest.py — and an inverse test
# pins that the failure without protobuf is the clean
# STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, not silent wrong data.

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningUserAggProcessor:
    """StatefulProcessor for per-user running (n, fsum(value), max ts).

    Defined duck-typed (init/handleInputRows/close) and mixed with the
    real ``StatefulProcessor`` base lazily in
    :func:`running_user_aggregates_tws`, so importing this module never
    requires the streaming-state machinery.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "agg", "n LONG, total DOUBLE, max_ts TIMESTAMP"
        )

    def handleInputRows(self, key, rows, timer_values) -> Iterable[pd.DataFrame]:
        import math

        n, total, max_ts = (
            self._state.get() if self._state.exists() else (0, 0.0, None)
        )
        # same up-front legacy-NaT normalization as _update_user_state
        # (ADVICE r10): an all-null stream after a poisoned checkpoint
        # must emit NULL, not re-persist NaT
        max_ts = None if pd.isna(max_ts) else max_ts
        for pdf in rows:
            n += len(pdf)
            total = math.fsum([total] + list(pdf["value"].dropna()))
            # same NaT guard as _update_user_state (ADVICE r9): an
            # all-null chunk must leave max_ts untouched, and a NaT that
            # leaked into state must not absorb later real timestamps
            batch_max = pdf["ts"].max()
            if not pd.isna(batch_max) and (
                max_ts is None or pd.isna(max_ts) or batch_max > max_ts
            ):
                max_ts = batch_max
        self._state.update((n, float(total), max_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(total)],
                "last_ts": [max_ts],
            }
        )

    def close(self) -> None:
        pass


def running_user_aggregates_tws(events_stream: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` form of :func:`running_user_aggregates`.

    Same output schema and update semantics; named ValueState instead of
    the applyInPandasWithState tuple. The caller must run under the
    RocksDB state store provider (see :func:`run_stateful_stream_tws`).
    """
    from pyspark.sql.streaming import StatefulProcessor

    processor_cls = type(
        "RunningUserAggStateful", (RunningUserAggProcessor, StatefulProcessor), {}
    )
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=processor_cls(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_stateful_stream_tws(
    spark: SparkSession, feed_dir: str, checkpoint_dir: str, query_name: str
) -> None:
    """AvailableNow replay through the transformWithStateInPandas operator.

    Scopes the RocksDB provider conf try/finally (repo convention: demos
    never leak session confs)."""
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = (
            running_user_aggregates_tws(stream)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
