"""As-of join demo: each event joined to the customer's most recent order
at or before the event time. Oracle uses DuckDB's native ASOF LEFT JOIN;
the right side is deduplicated to one row per (customer, date) first so
tie behavior is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.operators.asof import asof_join
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_join_asof",
    sql="""
    WITH dedup_orders AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN dedup_orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as-of (backward) join via the union-tag + carry-forward window —
    one shuffle on the key, no range-candidate blowup."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    dedup = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        )
    )
    return asof_join(
        e,
        dedup,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["last_orderkey", "last_totalprice"],
    )
