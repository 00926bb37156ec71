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


@pytest.mark.slow
def test_delay_join_fullkey_bucketed_layout_zero_shuffle(spark, sf_dir):
    """The flagship composite-key join over the storage layout designed
    for it (round 11): both sides bucketed AND sorted on the FULL
    4-column key, tu.stop_id normalized to long at write so the join
    condition's cast folds away. The 4-key SortMergeJoin then needs no
    exchange and no per-task sort under DEFAULT confs — the pay-once
    100 TB layout operators/delay.py prescribes (a trip_id-only bucket
    reaches 0 exchanges only under
    spark.sql.requireAllClusterKeysForCoPartition=false and still pays
    the 4-key sort; tools/bench_scale.py measured the full-key form
    ~2x faster at 16x)."""
    import shutil

    from transit_efficiency_analysis_spark.operators.delay import compute_delays
    from transit_efficiency_analysis_spark.operators.testdata_adapter import (
        gtfs_data_view,
        trip_updates_view,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_delay")
    for t in ["tu_b", "gd_b"]:
        spark.sql(f"DROP TABLE IF EXISTS bucketing_delay.{t}")
    shutil.rmtree("/tmp/teas_warehouse/bucketing_delay.db", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = ["trip_id", "start_date", "stop_sequence", "stop_id"]
    (
        trip_updates_view(orders, lineitem)
        .withColumn("stop_id", F.col("stop_id").cast("long"))
        .write.mode("overwrite")
        .bucketBy(8, *keys)
        .sortBy(*keys)
        .saveAsTable("bucketing_delay.tu_b")
    )
    (
        gtfs_data_view(orders, lineitem)
        .write.mode("overwrite")
        .bucketBy(8, *keys)
        .sortBy(*keys)
        .saveAsTable("bucketing_delay.gd_b")
    )
    joined = compute_delays(
        spark.table("bucketing_delay.tu_b"),
        spark.table("bucketing_delay.gd_b"),
        sort=False,
    )
    assert count_shuffles(joined) == 0
    # and the layout changes nothing semantically
    plain = compute_delays(
        trip_updates_view(orders, lineitem),
        gtfs_data_view(orders, lineitem),
        sort=False,
    )
    assert joined.count() == plain.count()
