"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``transit_efficiency_analysis_spark/``;
this module is a thin adapter over its demo registry
(``transit_efficiency_analysis_spark/demo``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transit_efficiency_analysis_spark.demo import load_registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full delay-consolidation pipeline (the reference's
    ``trip_updates_with_diffs`` rebuild, SURVEY.md §2.5 rebuild-full) over
    GTFS-shaped views of the testdata.
    """
    registry = load_registry()
    return registry["q_rebuild_full"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: d.fn for name, d in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for every SQL-expressible demo."""
    return {name: d.sql for name, d in load_registry().items() if d.sql is not None}
