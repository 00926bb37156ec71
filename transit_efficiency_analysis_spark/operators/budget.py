"""Distributed global running sum and token-budget corpus selection.

"Take the best documents until the token budget is spent" is the last
step of most corpus-composition recipes (quality-ranked greedy
selection). Semantically it is a running sum over a global ORDER BY —
which, written naively as ``Window.orderBy(...)`` with no partition key,
collapses the whole relation into ONE task. Fine at demo scale, fatal at
100 TB.

The distributed formulation here is the classic two-pass prefix sum:

1. every row gets a coarse ``_pid`` bucket id computed as a
   DETERMINISTIC expression over the data: the number of literal
   boundary values below the row's ``bucket_by`` key. The boundaries
   are approximate quantiles of ``bucket_by``, collected ONCE to the
   driver (≤ ``n_buckets - 1`` scalars, bounded) and embedded as
   literals — so every consumer of the relation computes the SAME
   bucket for the same row, no matter how Spark physically partitions
   any branch of the plan;
2. one tiny aggregation computes each bucket's weight subtotal
   (≤ ``n_buckets`` rows), and a window over those rows turns subtotals
   into per-bucket prefix offsets — the only unpartitioned window in
   the plan ever sees ``n_buckets`` rows, not N;
3. the offsets broadcast back and a window PARTITIONED BY the bucket
   adds the within-bucket running sum — every task scans only its own
   slice.

Until round 10 the bucket id was ``spark_partition_id()`` above a
``repartitionByRange`` — correct only while the subtotal branch and the
join branch observed the SAME physical exchange. RangePartitioner
samples its boundaries per execution, so if exchange reuse ever failed
to kick in (plan canonicalization change, AQE behavior), the two
branches could sample different boundaries and the broadcast offsets
would attach to the wrong partitions — wrong cumulative sums with no
error (ADVICE r9). The literal-boundary bucket removes the physical
coupling entirely: quantile skew now affects only balance, never
correctness.

The output is partitioning-invariant: the ordering key must be total
(pass a unique tiebreaker column), so the cumulative value of each row
does not depend on where the quantile boundaries land.

Not present in the reference repo (BASELINE.json north star): part of
the LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_by: list[Column],
    weight: Column | str,
    cum_col: str = "cum",
    n_buckets: int = 32,
    bucket_by: Column | str | None = None,
) -> DataFrame:
    """Add a global running sum of ``weight`` along ``order_by``.

    ``order_by`` must be a total order (include a unique tiebreaker) so
    the result is well-defined. ``bucket_by`` must be a non-null
    expression that is monotone NON-DECREASING along the ``order_by``
    direction (for ``quality DESC, id ASC`` pass ``-quality``): rows
    that share a ``bucket_by`` value are then contiguous in the global
    order, so bucket boundaries always respect it. No single-partition
    pass over the data: the only global window runs over ``n_buckets``
    subtotal rows, and the data-proportional window is partitioned by
    the bucket id.
    """
    if bucket_by is None:
        raise ValueError(
            "running_total: pass bucket_by (an expression monotone "
            "non-decreasing along order_by, e.g. the negated leading "
            "sort column for a DESC order)"
        )
    if n_buckets < 1:
        raise ValueError(f"running_total: n_buckets must be >= 1, got {n_buckets}")
    w = F.col(weight) if isinstance(weight, str) else weight
    key = F.col(bucket_by) if isinstance(bucket_by, str) else bucket_by

    # Boundaries: approximate quantiles of the bucket key, collected once
    # (bounded: n_buckets - 1 scalars) and embedded as literals. They
    # steer balance only — any boundary set yields correct sums. With a
    # single bucket there are no boundaries and no percentile action.
    if n_buckets == 1:
        uniq: list = []
    else:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        (bounds,) = df.select(
            F.percentile_approx(key, qs, 10_000).alias("b")
        ).first()
        uniq = sorted({b for b in (bounds or []) if b is not None})

    bucket = F.lit(0)
    for b in uniq:
        bucket = bucket + F.when(key > F.lit(b), 1).otherwise(0)
    part = df.withColumn("_pid", bucket.cast("int"))

    psums = part.groupBy("_pid").agg(F.sum(w).alias("_psum"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = psums.select(
        "_pid", F.coalesce(F.sum("_psum").over(off_w), F.lit(0)).alias("_off")
    )
    within = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn(cum_col, (F.col("_off") + F.sum(w).over(within)).cast("long"))
        .drop("_pid", "_off")
    )


def budget_select(
    df: DataFrame,
    order_by: list[Column],
    weight: Column | str,
    budget: Column,
    cum_col: str = "cum",
    n_buckets: int = 32,
    bucket_by: Column | str | None = None,
) -> DataFrame:
    """Greedy selection under a weight budget: keep the prefix of
    ``df`` in ``order_by`` order whose cumulative ``weight`` stays
    within ``budget`` (inclusive of the row that reaches it).

    ``budget`` is a Column so callers can derive it from the data (e.g.
    a fraction of the corpus total) without collecting to the driver.
    ``bucket_by`` as in :func:`running_total`.
    """
    return running_total(df, order_by, weight, cum_col, n_buckets, bucket_by).where(
        F.col(cum_col) <= budget
    )
