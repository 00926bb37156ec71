"""Upsert / dedup / merge kernels (SURVEY.md §2.5).

The reference gets upsert semantics from Postgres ``INSERT ... ON CONFLICT``
executed one row per transaction (``realtime_extractor.py:198-234`` — its
dominant cost). On Spark there is no mutable row store; the same semantics
compile to *window dedup over a union*, executed set-at-a-time:

- ``upsert_ignore``  — first-writer-wins (``ON CONFLICT DO NOTHING``,
  ``historical_extractor.py:85-87``): keep the earliest observation per key.
- ``upsert_keep_newest`` — the conditional update (``ON CONFLICT DO UPDATE
  ... WHERE changed``, ``realtime_extractor.py:205-230``): keep the newest
  observation per key; ``updated_at`` is touched only when a tracked value
  actually changed relative to the previous version.

Scale notes: one shuffle on the key columns (the minimum possible — any
upsert must co-locate keys). At 100 TB the stored table is partitioned by
``start_date`` so the union+window only runs over the partitions the batch
touches; with Delta/Iceberg the same kernel drives ``MERGE INTO``. AQE
handles skewed keys (a hot trip_id) via skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering(cols: list[str], descending: bool) -> list[Column]:
    return [F.col(c).desc() if descending else F.col(c).asc() for c in cols]


def upsert_ignore(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """First-writer-wins dedup: keep the first row per ``keys`` ordered by
    ``order_by`` ascending. Deterministic iff ``order_by`` is a total order
    within each key group (include a unique tiebreaker column).
    """
    w = Window.partitionBy(*keys).orderBy(*_ordering(order_by, descending=False))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_keep_newest(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    tracked: list[str] | None = None,
    now_col: str | None = None,
) -> DataFrame:
    """Keep the newest row per ``keys`` (ordered by ``order_by`` descending).

    When ``tracked`` is given, an ``updated_at`` column is produced carrying
    ``now_col`` (a timestamp column name present in ``df``) only if any
    tracked column differs from the *previous* (second-newest) version —
    the reference's conditional-update suppression
    (``realtime_extractor.py:216-218,228-230``); otherwise NULL.
    """
    w = Window.partitionBy(*keys).orderBy(*_ordering(order_by, descending=True))
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if tracked is None:
        return ranked.where(F.col("__rn") == 1).drop("__rn")

    # a lead over a constant distinguishes "no previous version" from
    # "previous version whose tracked value is NULL" — a NULL→value change
    # must still count as changed
    prev_exists = F.lead(F.lit(1), 1).over(w).isNotNull()
    any_diff: Column = F.lit(False)
    for t in tracked:
        prev = F.lead(t, 1).over(w)  # next row in desc order = previous version
        any_diff = any_diff | ~F.col(t).eqNullSafe(prev)
    ranked = ranked.withColumn("__changed", prev_exists & any_diff)
    out = ranked.where(F.col("__rn") == 1)
    if now_col is not None:
        out = out.withColumn(
            "updated_at",
            F.when(F.col("__changed"), F.col(now_col)).otherwise(
                F.lit(None).cast("timestamp")
            ),
        )
    return out.drop("__rn", "__changed")


def merge_batch(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """Apply a micro-batch of ``incoming`` rows onto ``existing`` state:
    union + keep-newest per key. Equivalent to replaying every row through
    ``ON CONFLICT DO UPDATE`` regardless of arrival order (property-tested
    in tests/test_upsert.py)."""
    return upsert_keep_newest(existing.unionByName(incoming), keys, order_by)
