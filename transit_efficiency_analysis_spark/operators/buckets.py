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
resumable — the same property the hash-sampling operators rely on.

Scale shape (round-3 ADVICE): a naive ``row_number`` window routes the
ENTIRE storm bucket into one task to sort — the corpus-wide degenerate
bucket this cap exists to guard becomes a one-task hotspot of ~|corpus|
rows. Here the window only ever sees a bounded slice: per-bucket counts
identify oversized buckets, a conservative md5-prefix threshold keeps
~``prefilter_margin × max_bucket_size`` uniformly-hashed rows of each
(the binomial undershoot probability at margin 4 is ~e^(-cap), and an
exactness guard falls back to the full bucket if it ever fires), and the
rank runs on those survivors. Selected rows are byte-identical to the
full-sort semantics, so oracle twins are unchanged.
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
    prefilter_margin: int = 4,
) -> DataFrame:
    """Keep at most ``max_bucket_size`` rows per bucket, chosen by
    deterministic ``md5(id)`` order (ties broken by the id itself).

    Rows in buckets at or under the cap pass through untouched, so the
    result is always a subset of the input and under-cap buckets are
    byte-identical. Dropping a row only removes candidate pairs — never
    invents them — so every downstream pair/topk result built from a
    capped relation is a subset of the uncapped result's candidate set
    (property-tested in tests/test_bucket_cap.py).

    The selected set equals ``row_number() OVER (PARTITION BY bucket
    ORDER BY md5(id), id) <= max_bucket_size`` exactly; the prefix
    prefilter only bounds how many rows the ranking window touches.
    """
    if max_bucket_size < 1:
        raise ValueError("max_bucket_size must be >= 1")
    if prefilter_margin < 2:
        raise ValueError("prefilter_margin must be >= 2")
    keys = list(bucket_cols)
    h = F.md5(F.col(id_col).cast("string"))
    order = [h, F.col(id_col)]

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
    over = counts.where(F.col("__bn") > max_bucket_size)
    joined = df.join(over, keys, "left")
    small = joined.where(F.col("__bn").isNull()).drop("__bn")
    big = joined.where(F.col("__bn").isNotNull())

    # md5 hex order == numeric order of the leading 32-bit prefix for a
    # strict prefix threshold: every row among the bucket's cap smallest
    # full hashes has prefix < k whenever >= cap rows do (prefix < k
    # implies hash < k·2^96 <= the cap-th hash's block). k targets
    # margin×cap expected survivors out of __bn uniform draws.
    prefix = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    k = F.ceil(
        F.lit(float(prefilter_margin * max_bucket_size))
        / F.col("__bn")
        * F.lit(float(2**32))
    ).cast("long")
    pre = big.where(prefix < k)

    # exactness guard: if the prefilter ever kept fewer than the cap (or
    # fewer than the whole bucket, for buckets the threshold can't fill),
    # rank that bucket's FULL row set instead — semantics never degrade.
    need = F.least(F.lit(max_bucket_size).cast("long"), F.col("__bn"))
    surv = pre.groupBy(*keys).agg(F.count(F.lit(1)).alias("__sn"))
    ok_buckets = surv.join(over, keys).where(F.col("__sn") >= need).select(*keys)
    ranked_input = pre.join(ok_buckets, keys, "left_semi").unionByName(
        big.join(ok_buckets, keys, "left_anti")
    )

    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    capped = (
        ranked_input.withColumn("__bucket_rank", F.row_number().over(w))
        .where(F.col("__bucket_rank") <= max_bucket_size)
        .drop("__bucket_rank", "__bn")
    )
    return small.unionByName(capped)
