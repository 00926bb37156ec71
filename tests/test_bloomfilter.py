"""Bloom runtime pre-filter: no false negatives, transparent end-to-end,
and a map-only probe plan (the properties that make it safe and worth it
at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.bloomfilter import (
    bloom_prefilter,
    build_bloom,
)
from transit_efficiency_analysis_spark.plans import count_shuffles, physical_plan
from transit_efficiency_analysis_spark.sources.registry import load_table


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7 + 1).alias("k"))
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    bloom = build_bloom(keys, "k")
    kept = {r.k for r in bloom_prefilter(fact, bloom, "k").collect()}
    true_keys = {r.k for r in keys.collect() if r.k < 5000}
    assert true_keys <= kept, "bloom dropped a true member (false negative)"


def test_false_positive_rate_within_bound(spark):
    n = 2000
    keys = spark.range(0, n).select((F.col("id") * 3).alias("k"))
    fact = spark.range(100_000, 140_000).select(F.col("id").alias("k"))  # disjoint
    bloom = build_bloom(keys, "k")
    fp = bloom_prefilter(fact, bloom, "k").count()
    # theoretical fp ≈ (1 - e^(-k·n/m))^k ≈ 0.06% at n=2000, m=65536, k=3;
    # allow 10× headroom for hash clustering
    assert fp <= 40_000 * 0.006, f"fp rate too high: {fp}/40000"


def test_prefiltered_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = build_bloom(keys, "o_orderkey")
    pre = (
        bloom_prefilter(li, bloom, "l_orderkey")
        .join(keys, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_linenumber")
    )
    plain = li.join(keys, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_linenumber"
    )
    assert pre.exceptAll(plain).count() == 0
    assert plain.exceptAll(pre).count() == 0


def test_probe_side_is_map_only(spark, sf_dir):
    """The fact-side probe must add NO shuffle: the only exchanges in the
    probed plan are the bloom build's own tiny aggregations (2), plus the
    one-row broadcast. A fact-side exchange would defeat the operator."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = load_table(spark, sf_dir, "orders").select("o_orderkey")
    bloom = build_bloom(keys, "o_orderkey")
    build_only = count_shuffles(bloom)
    probed = bloom_prefilter(li, bloom, "l_orderkey")
    assert count_shuffles(probed) == build_only, "probe added a fact-side shuffle"
    assert "BroadcastNestedLoopJoin" in physical_plan(probed)


def test_bloom_is_bounded_and_small(spark):
    """m=65536/k=3 → at most 1024 map entries regardless of key count."""
    keys = spark.range(0, 20_000).select(F.col("id").alias("k"))
    row = build_bloom(keys, "k").collect()[0]
    assert len(row.bloom) <= 1024


def test_sized_m_bits_envelope():
    from transit_efficiency_analysis_spark.operators.bloomfilter import (
        DEFAULT_M_BITS,
        MAX_M_BITS,
        sized_m_bits,
    )

    assert sized_m_bits(0) == DEFAULT_M_BITS
    assert sized_m_bits(1000) == DEFAULT_M_BITS  # floor
    assert sized_m_bits(30_076) == 1 << 19  # the measured sf0.1 case
    assert sized_m_bits(10**9) == MAX_M_BITS  # broadcast budget cap
    for n in (5000, 50_000, 500_000):
        m = sized_m_bits(n)
        assert m >= min(16 * n, MAX_M_BITS)
        assert m & (m - 1) == 0  # power of two
