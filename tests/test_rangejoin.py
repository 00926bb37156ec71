"""interval_point_join: bucketed plan, naive-join row equality."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.rangejoin import interval_point_join


def test_matches_naive_nonequi_join(spark):
    rng = random.Random(5)
    pts = spark.createDataFrame(
        [(i, rng.uniform(0, 100)) for i in range(300)], "pid long, p double"
    )
    ivs = spark.createDataFrame(
        [
            (j, lo, lo + rng.uniform(0.5, 12))
            for j, lo in ((j, rng.uniform(-5, 95)) for j in range(60))
        ],
        "iid long, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_point_join(pts, ivs, "p", "lo", "hi", bucket_width=8).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.join(
            ivs, (F.col("lo") <= F.col("p")) & (F.col("p") < F.col("hi"))
        ).collect()
    }
    assert got == naive and len(got) > 0


def test_boundary_points(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 19.999)], "pid long, p double")
    ivs = spark.createDataFrame([(7, 10.0, 20.0)], "iid long, lo double, hi double")
    rows = interval_point_join(pts, ivs, "p", "lo", "hi", bucket_width=10).collect()
    # closed-open: lo included, hi excluded; bucket-boundary hi costs no dupes
    assert {(r["pid"], r["iid"]) for r in rows} == {(1, 7), (3, 7)}
    assert len(rows) == 2
