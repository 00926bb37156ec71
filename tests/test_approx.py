"""Error-bound tests for the sketch operators (their correctness contract,
since they have no cross-engine oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.sources.registry import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = load_registry()["q_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        # rsd=0.02 → generous 10% acceptance band (rsd is a std-dev, not a max)
        assert abs(r["approx_users"] - exact) <= max(0.1 * exact, 2)


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    rows = load_registry()["q_approx_quantiles"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["q"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("q"))
        .collect()
    }
    for r in rows:
        approx_median = r["price_quantiles"][1]
        ex = exact[r["l_returnflag"]]
        assert abs(approx_median - ex) / ex < 0.05
