"""Custom connector via the Python Data Source API (Spark 4).

The reference's ingest edge is a poll loop fetching a vendor feed
(``realtime_extractor.py:122-240`` — ``main()``'s fetch/retry/insert
orchestration; the adjacent ``parse_pb_data`` at :97 is the protobuf
parse step) — driver-side orchestration in this repo (`SURVEY §2.1`). The Python Data Source API is Spark's native way
to make such a feed a first-class TABLE instead: a ``DataSource``
subclass declares schema + partitioning, and each ``InputPartition`` is
read ON AN EXECUTOR — listing parallelizes, no row ever funnels through
the driver, and the scan composes with Catalyst like any other source
(column pruning against the declared schema, distributed generation,
AQE downstream).

``VehiclePingsDataSource`` is the deterministic stand-in for a vendor
position feed: every (vehicle, poll) pair maps to one ping through pure
integer arithmetic — mixed-congruential delay jitter, modular route
assignment, a fixed 30 s poll cadence from a fixed epoch. Determinism
is the point: the oracle (DuckDB ``generate_series`` over the same
arithmetic) reproduces the source bit-for-bit, so the driver hash
checks the CONNECTOR — partition bounds, per-executor generation,
schema — not a lucky aggregate.

Scale: partitions stripe the vehicle id space evenly; ``read`` is a
generator (rows stream out in Arrow batches, nothing materializes per
partition); a real connector would swap the arithmetic for an HTTP/
protobuf fetch per shard and keep exactly this shape.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: fixed epoch for poll 0 — 2026-01-01T00:00:00 UTC
PINGS_EPOCH = 1767225600
POLL_PERIOD_S = 30
ROUTES = ["R1", "R2", "R3", "R7", "R9"]


def ping_row(vehicle: int, poll: int) -> tuple[int, int, int, int, str]:
    """The feed's row arithmetic — shared by reader and tests (the
    DuckDB oracle in demo/pysource.py re-states it in SQL)."""
    ts_epoch = PINGS_EPOCH + poll * POLL_PERIOD_S
    delay_s = (vehicle * 7919 + poll * 104729) % 3600 - 1800
    route = ROUTES[(vehicle * 31 + poll // 120) % len(ROUTES)]
    return vehicle, poll, ts_epoch, delay_s, route


class _PingsPartition(InputPartition):
    def __init__(self, lo: int, hi: int, n_polls: int):
        self.lo, self.hi, self.n_polls = lo, hi, n_polls


class _PingsReader(DataSourceReader):
    def __init__(self, options):
        self.n_vehicles = int(options.get("n_vehicles", 64))
        self.n_polls = int(options.get("n_polls", 120))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        n_parts = max(1, min(self.n_partitions, self.n_vehicles))
        step = -(-self.n_vehicles // n_parts)  # ceil division
        return [
            _PingsPartition(lo, min(lo + step, self.n_vehicles), self.n_polls)
            for lo in range(0, self.n_vehicles, step)
        ]

    def read(self, partition: _PingsPartition) -> Iterator[tuple]:
        for vehicle in range(partition.lo, partition.hi):
            for poll in range(partition.n_polls):
                yield ping_row(vehicle, poll)


class VehiclePingsDataSource(DataSource):
    """``spark.read.format("vehicle_pings")`` after
    ``spark.dataSource.register(VehiclePingsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "vehicle_pings"

    def schema(self) -> str:
        return (
            "vehicle_id BIGINT, poll BIGINT, ts_epoch BIGINT, "
            "delay_s BIGINT, route STRING"
        )

    def reader(self, schema) -> _PingsReader:
        return _PingsReader(self.options)
