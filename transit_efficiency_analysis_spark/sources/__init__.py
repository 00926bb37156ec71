"""Source readers: testdata registry, GTFS static CSV, realtime feed decode."""

from transit_efficiency_analysis_spark.sources.registry import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
)
