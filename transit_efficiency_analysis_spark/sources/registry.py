"""Testdata table registry.

Reads the driver-generated parquet tables (TESTDATA.md) from an ``sf_dir``.
Parquet scans are Catalyst-native: column pruning and predicate pushdown
reach the scan automatically; at 100 TB the same code reads a partitioned
table from object storage with partition pruning on date predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read several testdata tables; returns {name: DataFrame}."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
