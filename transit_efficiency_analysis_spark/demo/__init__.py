"""Driver-verifiable demo queries (the ``queries()`` / ``oracle_sql()`` surface).

Each operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions) gets
a named demo: a PySpark callable ``(spark, sf_dir) -> DataFrame`` over the
driver's testdata tables, and — when SQL-expressible — an exact ANSI-SQL twin
that DuckDB runs on the same parquet for the correctness gate.

Register with the ``@demo`` decorator; ``__spark_entry__.py`` re-exports the
registry. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Demo:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check


REGISTRY: dict[str, Demo] = {}

# Module order sets registry order, which sets the driver's correctness
# window (the driver oracle-checks the FIRST 50 registry entries only).
# Rounds 1-2 earned green rows for the core/timefns/joins/upsert/delay/
# analytics/windows/setops/textops families (CORRECTNESS_r02.json: 49 green
# + 1 no-oracle-by-design); those modules now sit at the back so the 51
# previously-unchecked demos (LLM-pipeline ops, TPC-H, ingest, JDBC, SQL
# surface) occupy the first 50 slots and earn hard driver verdicts.
_DEMO_MODULES = [
    "dedup",
    "similarity",
    "multimodal",
    "sinks",
    "sqlsurface",
    "pandasudf",
    "windowed",
    "ingest",
    "asof",
    "tpch",
    "sampling",
    "textprep",
    "semistructured",
    "jdbc",
    "approx",
    "graphextras",
    # --- driver-green in r01/r02 (rows on record) ---
    "core",
    "timefns",
    "joins",
    "upsert",
    "delay",
    "analytics",
    "windows",
    "setops",
    "textops",
]


def demo(name: str, sql: str | None = None):
    """Register a demo query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Demo(name, fn, sql)
        return fn

    return deco


def load_registry() -> dict[str, Demo]:
    """Import all demo modules (idempotent) and return the registry."""
    for mod in _DEMO_MODULES:
        importlib.import_module(f"transit_efficiency_analysis_spark.demo.{mod}")
    return REGISTRY
