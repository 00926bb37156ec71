"""End-to-end pipeline API — what replaces the reference's three entry
points (``historical_extractor.py`` / ``realtime_extractor.py`` +
``get_realtime.py`` / ``main_runner.py`` → ``diff_times.py``).

A user of the reference runs three cron'd scripts against two Postgres
instances over SSH; a user of this engine calls three functions (or runs
the streaming variant) against one storage layer:

    ingest_schedule(spark, csv_dir, store)        # static GTFS → gtfs_data
    ingest_realtime(spark, feed_df, store, ...)   # poll batch → trip_updates upsert
    consolidate(spark, store)                     # join + diffs → trip_updates_with_diffs

The 80 LoC of SSH/CSV transfer plumbing (``loader/get_realtime.py``) maps
to nothing: there is one store. Locks, rate-limit files, and cron are the
streaming runtime's checkpoint + trigger (``streaming/``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from transit_efficiency_analysis_spark import schemas
from transit_efficiency_analysis_spark.operators.delay import compute_delays
from transit_efficiency_analysis_spark.sinks import overwrite_table
from transit_efficiency_analysis_spark.operators.upsert import merge_batch, upsert_ignore
from transit_efficiency_analysis_spark.sources.gtfs_realtime import (
    apply_epoch0_default,
    decode_feed,
    enrich_weather,
)
from transit_efficiency_analysis_spark.sources.gtfs_static import (
    build_gtfs_data,
    read_gtfs_static,
)


class Store:
    """Parquet table locations (Delta/Iceberg at scale — same call sites)."""

    def __init__(self, root: str):
        self.gtfs_data = os.path.join(root, "gtfs_data")
        self.trip_updates = os.path.join(root, "trip_updates")
        self.diffs = os.path.join(root, "trip_updates_with_diffs")


def ingest_schedule(
    spark: SparkSession, csv_dir: str, store: Store, tz: str = "America/Toronto"
) -> DataFrame:
    """Static ingest: CSVs → star join → time parse → PK dedup → partitioned
    parquet (replaces ``historical_extractor.py`` minus the HTTP fetch)."""
    gtfs_data = build_gtfs_data(read_gtfs_static(spark, csv_dir), tz)
    deduped = upsert_ignore(
        gtfs_data, keys=list(schemas.PRIMARY_KEY), order_by=["route_id", "arrival_time"]
    )
    deduped.write.mode("overwrite").partitionBy("start_date").parquet(store.gtfs_data)
    return spark.read.parquet(store.gtfs_data)


def ingest_realtime(
    spark: SparkSession,
    feed: DataFrame,
    store: Store,
    weather: tuple[int, str, float] | None = None,
    now=None,
) -> DataFrame:
    """One realtime poll: decode the nested feed, apply the epoch-0 default,
    denormalize the weather observation, then conditional-upsert into
    trip_updates (replaces ``realtime_extractor.py``'s per-row upserts).

    The merge replays ``ON CONFLICT DO UPDATE ... WHERE arrival/departure
    changed``: an unchanged poll keeps the stored row entirely (weather
    columns and ``updated_at`` included), ``created_at`` is stamped at
    first observation and never touched again, ``updated_at`` at the last
    real change (``realtime_extractor.py:205-230``).

    Audit stamps use the processing wall clock, exactly like the
    reference's ``datetime.now()`` (``realtime_extractor.py:185,234``):
    ``now=None`` (production) stamps ``current_timestamp()``; tests inject
    a fixed ``datetime`` for deterministic asserts. The stamp travels in
    an ``audit_ts`` column (the processing time of the surviving version)
    so replays across micro-batches keep exact reference semantics."""
    from pyspark.sql import functions as F

    batch = apply_epoch0_default(decode_feed(feed))
    batch = enrich_weather(batch, *(weather or (None, None, None)))
    audit = (
        F.current_timestamp()
        if now is None
        else F.lit(now.isoformat(sep=" ")).cast("timestamp")
    )
    batch = batch.withColumn("audit_ts", audit)
    existing = (
        spark.read.parquet(store.trip_updates)
        if os.path.exists(store.trip_updates)
        else batch.limit(0)
    )
    merged = merge_batch(
        existing,
        batch,
        keys=list(schemas.PRIMARY_KEY),
        order_by=["poll_ts"],
        tracked=["arrival_time", "departure_time"],
        ts_col="audit_ts",
    )
    # The merge READS the table it replaces. overwrite_table handles the
    # rebuild atomically per filesystem class: local paths write a fresh
    # versioned dir and atomically repoint a symlink (readers see old xor
    # new — the merge scans the old version while the new one fills);
    # object-store URIs stage + writer-commit. At scale the whole merge +
    # overwrite body is a Delta/Iceberg MERGE at the same call site.
    return overwrite_table(merged, store.trip_updates)


def consolidate(spark: SparkSession, store: Store) -> DataFrame:
    """The delay rebuild: trip_updates ⋈ gtfs_data → trip_updates_with_diffs,
    full recompute + atomic overwrite (replaces ``diff_times.py``'s
    DELETE + INSERT...SELECT). trip_updates carries the realtime shape
    (weather columns + poll audit), gtfs_data the schedule shape."""
    # trip_updates carries real audit columns maintained by the merge:
    # created_at = first observation, updated_at = last real change
    tu = spark.read.parquet(store.trip_updates)
    gd = spark.read.parquet(store.gtfs_data)
    diffs = compute_delays(tu, gd, sort=False)
    diffs.write.mode("overwrite").partitionBy("start_date").parquet(store.diffs)
    return spark.read.parquet(store.diffs)


def consolidate_incremental(
    spark: SparkSession, store: Store, changed_dates: list
) -> DataFrame:
    """Incremental view maintenance of the diffs table: recompute only the
    ``start_date`` partitions in ``changed_dates`` and overwrite just those
    partitions (dynamic partition overwrite).

    The reference rebuilds the whole table every cycle
    (``diff_times.py:38-111``); at 100 TB that is the difference between
    touching one day and touching years. The date predicates prune both
    input scans (both tables are partitioned by start_date), so cost is
    proportional to the changed slice. Correctness: the delay join is
    per-key and keys never cross start_date, so partition-local recompute
    equals the full recompute (tests/test_pipeline.py).
    """
    from pyspark.sql import functions as F

    tu = spark.read.parquet(store.trip_updates).where(
        F.col("start_date").isin(changed_dates)
    )
    gd = spark.read.parquet(store.gtfs_data).where(F.col("start_date").isin(changed_dates))
    diffs = compute_delays(tu, gd, sort=False)
    # per-write option, NOT a session conf mutation: a later full consolidate()
    # must keep static overwrite semantics (replace the whole table)
    diffs.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("start_date").parquet(store.diffs)
    return spark.read.parquet(store.diffs)

