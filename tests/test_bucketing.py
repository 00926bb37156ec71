"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the per-query shuffle entirely — the storage-level strategy
for the 100 TB composite-key delay join (SURVEY §1.3/§4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.plans import count_shuffles
from transit_efficiency_analysis_spark.sources.registry import load_table


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf set in session.py (/tmp/teas_warehouse);
    # the in-memory catalog forgets tables between sessions but their files
    # survive, so clear both before writing
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test")
    for t in ["li_bucketed", "o_bucketed"]:
        spark.sql(f"DROP TABLE IF EXISTS bucketing_test.{t}")
    shutil.rmtree("/tmp/teas_warehouse/bucketing_test.db", ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bucketing_test.li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bucketing_test.o_bucketed")
    )
    lb = spark.table("bucketing_test.li_bucketed")
    ob = spark.table("bucketing_test.o_bucketed")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # co-located bucketed join: zero shuffle exchanges in the plan
    assert count_shuffles(joined) == 0
    # and it computes the same result as the plain join
    plain = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    assert joined.count() == plain.count()
    assert (
        joined.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).collect()
        == plain.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).collect()
    )
