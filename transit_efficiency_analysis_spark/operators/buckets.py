"""Bucket-size capping for LSH candidate generation (the "boilerplate
storm" mitigation, docs/SCALE.md §LSH).

A single degenerate bucket — every doc sharing a boilerplate shingle, or
every embedding collapsing to one sign pattern — turns a bucketed self-join
into an all-pairs product: |bucket|² candidates from one key. At 100 TB a
few storm buckets can dominate (and did: the gap-interleaved-marker
experiment in tools/bench_scale.py went disk-full without a cap). The cap
bounds the per-bucket join contribution to ``max_bucket_size``² by keeping
a deterministic sample of each oversized bucket.

Sampling is by ``md5(id)`` order: unbiased w.r.t. the bucket's content,
reproducible across runs, engines, and partitionings (no RNG state), and
resumable — the same property the hash-sampling operators rely on. The
``row_number`` shuffle keys on the bucket columns, the very keys the
following candidate join shuffles on, so the exchange is reused rather
than added.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_buckets(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """Keep at most ``max_bucket_size`` rows per bucket, chosen by
    deterministic ``md5(id)`` order (ties broken by the id itself).

    Rows in buckets at or under the cap pass through untouched, so the
    result is always a subset of the input and under-cap buckets are
    byte-identical. Dropping a row only removes candidate pairs — never
    invents them — so every downstream pair/topk result built from a
    capped relation is a subset of the uncapped result's candidate set
    (property-tested in tests/test_bucket_cap.py).
    """
    assert max_bucket_size >= 1
    w = Window.partitionBy(*[F.col(c) for c in bucket_cols]).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__bucket_rank", F.row_number().over(w))
        .where(F.col("__bucket_rank") <= max_bucket_size)
        .drop("__bucket_rank")
    )
