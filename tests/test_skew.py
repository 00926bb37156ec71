"""Salted join must be row-for-row equal to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.skew import salted_join
from transit_efficiency_analysis_spark.sources.registry import load_table


def _multiset(df, cols):
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows)


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "k")
    plain = li.join(o, "k").select("k", "l_linenumber", "o_totalprice")
    salted = salted_join(
        li, o, key="k", salt_buckets=8, left_unique_col="l_partkey"
    ).select("k", "l_linenumber", "o_totalprice")
    cols = ["k", "l_linenumber", "o_totalprice"]
    assert _multiset(salted, cols) == _multiset(plain, cols)


def test_salted_join_with_skewed_key(spark):
    # a hot key holding half the left side
    left = spark.createDataFrame(
        [(1 if i % 2 == 0 else i, i) for i in range(1000)], "k long, uniq long"
    )
    right = spark.createDataFrame([(i, f"v{i}") for i in range(500)], "k long, val string")
    plain = left.join(right, "k")
    salted = salted_join(left, right, key="k", salt_buckets=4, left_unique_col="uniq")
    cols = ["k", "uniq", "val"]
    assert _multiset(salted, cols) == _multiset(plain, cols)


def test_salted_join_rejects_right_and_full(spark):
    """right/full outer would emit unmatched right rows once per salt
    bucket — the operator must refuse instead of silently duplicating."""
    import pytest

    left = spark.createDataFrame([(1, 10)], "k long, uniq long")
    right = spark.createDataFrame([(2, "v")], "k long, val string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(left, right, key="k", left_unique_col="uniq", how=how)
