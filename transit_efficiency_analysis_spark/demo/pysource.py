"""Demo for the Python Data Source connector (``sources/python_datasource.py``).

The driver hash checks the connector ROW-FOR-ROW: the demo returns the
raw scan (no aggregation to hide behind) and the oracle regenerates the
identical table from the same arithmetic with DuckDB ``generate_series``
— so partition striping, per-executor generation, and schema all have to
be exactly right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.python_datasource import (
    VehiclePingsDataSource,
)

_N_VEHICLES, _N_POLLS = 64, 120

_PINGS_ORACLE = f"""
    WITH v AS (SELECT unnest(generate_series(0, {_N_VEHICLES - 1})) AS vehicle),
    p AS (SELECT unnest(generate_series(0, {_N_POLLS - 1})) AS poll)
    SELECT CAST(vehicle AS BIGINT) AS vehicle_id,
           CAST(poll AS BIGINT) AS poll,
           CAST(1767225600 + poll * 30 AS BIGINT) AS ts_epoch,
           CAST((vehicle * 7919 + poll * 104729) % 3600 - 1800 AS BIGINT)
               AS delay_s,
           (['R1','R2','R3','R7','R9'])[(vehicle * 31 + poll // 120) % 5 + 1]
               AS route
    FROM v CROSS JOIN p
"""


@demo("q_src_python_datasource", sql=_PINGS_ORACLE)
def q_src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python Data Source API (Spark 4): the deterministic vehicle-pings
    connector read as a first-class table. ``partitions()`` stripes the
    vehicle id space into 8 input partitions, each generated ON AN
    EXECUTOR by the reader's generator (Arrow-batched out, nothing
    through the driver) — the native custom-connector path a real
    vendor-feed ingest would take at scale. Registration is
    per-session and idempotent; the scan itself composes with Catalyst
    (the declared schema supports column pruning like any source)."""
    spark.dataSource.register(VehiclePingsDataSource)
    return (
        spark.read.format("vehicle_pings")
        .option("n_vehicles", str(_N_VEHICLES))
        .option("n_polls", str(_N_POLLS))
        .option("n_partitions", "8")
        .load()
    )
