"""JDBC source/sink demos (SURVEY.md §2.1 src-jdbc / §2.2 sink-jdbc-insert).

The reference reads/writes Postgres via SQLAlchemy
(``loader/get_realtime.py:36``, ``scripts/realtime_extractor.py:198``); the
engine's production store is parquet/Delta, but the JDBC surface itself is
first-class Spark: ``df.write.jdbc`` (set-based batched INSERTs — the very
bottleneck fix for the reference's row-per-transaction writes) and
``spark.read.jdbc`` with ``partitionColumn`` bounds so a 1000-executor
cluster scans a big table as parallel range queries, not one connection.

Demoed against embedded Apache Derby (bundled with Spark, zero setup): the
round-trip writes a projection to a real SQL database and reads it back
partitioned; the oracle recomputes the same projection straight from
parquet — equality proves the JDBC hop was lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


def jdbc_roundtrip(
    df: DataFrame,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 4,
) -> DataFrame:
    """Write ``df`` to a JDBC table (overwrite) and read it back; when
    ``partition_column`` is given the read is split into ``num_partitions``
    parallel range scans over the observed min/max (the 100 TB JDBC read
    shape — one range query per task, no single-connection bottleneck)."""
    df.write.mode("overwrite").jdbc(url, table)
    spark = df.sparkSession
    if partition_column is None:
        return spark.read.jdbc(url, table)
    # bounds come from the WRITTEN table (one tiny min/max query pushed to
    # the database, not a second scan of the source plan). ANSI-quoted
    # column identifiers: Spark's JDBC writer creates case-exact quoted
    # columns, so a bare name would case-fold (Derby: id -> ID, unknown).
    pc = '"' + partition_column.replace('"', '""') + '"'
    lo, hi = spark.read.jdbc(
        url, f"(SELECT min({pc}) lo, max({pc}) hi FROM {table}) b"
    ).first()
    if lo is None or hi is None:
        # empty table: min/max are NULL — no range to split, plain read
        return spark.read.jdbc(url, table)
    return spark.read.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=int(lo),
        upperBound=int(hi) + 1,
        numPartitions=num_partitions,
    )


@demo(
    "q_jdbc_roundtrip",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 5000
    """,
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-jdbc-insert + src-jdbc: parquet → Derby (batched set-based
    INSERTs) → partitioned JDBC read-back. The oracle computes the same
    projection directly, so a hash match proves lossless round-trip."""
    db = os.path.join(
        tempfile.gettempdir(),
        f"teas_jdbc_{os.path.basename(sf_dir.rstrip('/'))}",
        "db",
    )
    url = f"jdbc:derby:{db};create=true"
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return jdbc_roundtrip(c, url, "customer_rt", partition_column="c_custkey")
