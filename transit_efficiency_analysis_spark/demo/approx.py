"""Approximate-algorithm demos (rows-only checks — no oracle).

HyperLogLog distinct counts and quantile sketches are engine-specific by
construction (Spark's HLL++ and DuckDB's HLL give different estimates for
the same data), so these demos deliberately omit ``oracle_sql`` — the
driver records the weaker rows-only check, which is the honest contract
for sketch operators. Tests pin their error bounds against exact values
instead (tests/test_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo("q_approx_distinct", sql=None)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for
    cardinality over columns too wide to exact-count — constant memory per
    group vs a full distinct shuffle."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@demo("q_approx_quantiles", sql=None)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch): streaming-friendly
    quantiles with bounded state — the 100 TB alternative to exact sorts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.9, 0.99], 10000).alias(
            "price_quantiles"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
