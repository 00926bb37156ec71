"""Distributed global running sum and token-budget corpus selection.

"Take the best documents until the token budget is spent" is the last
step of most corpus-composition recipes (quality-ranked greedy
selection). Semantically it is a running sum over a global ORDER BY —
which, written naively as ``Window.orderBy(...)`` with no partition key,
collapses the whole relation into ONE task. Fine at demo scale, fatal at
100 TB.

The distributed formulation here is the classic two-pass prefix sum:

1. ``repartitionByRange(B, order)`` range-partitions the relation on the
   selection order, so partition i holds a contiguous slice of the
   global order (RangePartitioner's invariant: every key in partition i
   sorts before every key in partition i+1);
2. one tiny aggregation computes each partition's weight subtotal
   (B rows), and a window over those B rows turns subtotals into
   per-partition prefix offsets — the only unpartitioned window in the
   plan ever sees B rows, not N;
3. the offsets broadcast back and a window PARTITIONED BY the range
   bucket adds the within-partition running sum — every task scans only
   its own slice.

The output is partitioning-invariant: the ordering key must be total
(pass a unique tiebreaker column), so the cumulative value of each row
does not depend on where the sampled range boundaries land.

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
) -> DataFrame:
    """Add a global running sum of ``weight`` along ``order_by``.

    ``order_by`` must be a total order (include a unique tiebreaker) so
    the result is well-defined. No single-partition pass over the data:
    the only global window runs over ``n_buckets`` subtotal rows.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    part = df.repartitionByRange(n_buckets, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
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
) -> DataFrame:
    """Greedy selection under a weight budget: keep the prefix of
    ``df`` in ``order_by`` order whose cumulative ``weight`` stays
    within ``budget`` (inclusive of the row that reaches it).

    ``budget`` is a Column so callers can derive it from the data (e.g.
    a fraction of the corpus total) without collecting to the driver.
    """
    return running_total(df, order_by, weight, cum_col, n_buckets).where(
        F.col(cum_col) <= budget
    )
