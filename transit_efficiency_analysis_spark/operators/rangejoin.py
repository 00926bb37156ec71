"""Point-in-interval range join without the cartesian cliff.

A naive ``points JOIN intervals ON lo <= p AND p < hi`` has no equi-key,
so Spark plans BroadcastNestedLoopJoin — |points|·|intervals| comparisons,
the join shape that dies first at scale. This operator buckets the number
line: every interval explodes into the fixed-width buckets it covers,
every point maps to exactly one bucket, and the join becomes a bucket
equi-join with the interval predicate as a residual filter. Candidate
volume is |points| × (intervals overlapping each point's bucket) — local
density, not the cross product — and the single shuffle keys on bucket
ids, co-partitioning both sides.

Each (point, interval) pair can only meet in the point's own bucket, so
no post-join dedup is needed. Pick ``bucket_width`` near the typical
interval span: each interval then lands in ~2 buckets (span/width + 1
rows after the explode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join ``points`` to every interval with ``lo <= point < hi``.

    Returns all columns of both inputs. ``bucket_width`` only affects the
    plan (explode factor / bucket density), never the result set.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(float(bucket_width))).cast("long")

    # an interval [lo, hi) covers buckets floor(lo/W)..floor(hi/W); the
    # top bucket is kept even when hi is exactly on a boundary (one
    # harmless extra row per interval — the residual predicate drops it)
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(F.col(lo_col)), bucket_of(F.col(hi_col)))),
    )
    keyed_points = points.withColumn("__bucket", bucket_of(F.col(point_col)))
    joined = keyed_points.join(exploded, "__bucket").where(
        (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")
