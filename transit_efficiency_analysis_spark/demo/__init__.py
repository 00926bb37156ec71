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
# Round-4 rotation: the front 50 now hold (a) the 11 entries that had
# never been driver-checked (approx sketches + the round-3 graphextras
# variants), (b) everything that changed or landed this round — the
# hashability-fixed q_array_agg, the new GTFS-RT decode / sink-truncate /
# TPC-H Q7-Q22 / IVF-PQ demos, the rewritten simhash pair, and the
# restructured SQL-string demos — and (c) already-green r3 rows as
# filler. Families whose green rows are on record and whose code is
# unchanged (or value-neutral) sit behind the window: r1/r2 families at
# the back, plus multimodal/pandasudf/windowed/asof/sampling/textprep/
# semistructured/jdbc from r3 (CORRECTNESS_r03.json).
_DEMO_MODULES = [
    "approx",
    "graphextras",
    "corpusops",
    "ingest",
    "sinks",
    "sqlsurface",
    "tpch",
    "dedup",
    "similarity",
    # --- window boundary: everything below is behind the first 50 ---
    "subqueries",
    "multimodal",
    "pandasudf",
    "windowed",
    "asof",
    "sampling",
    "textprep",
    "semistructured",
    "jdbc",
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
