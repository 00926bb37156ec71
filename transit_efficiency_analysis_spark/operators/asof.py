"""As-of (backward) join — the timeseries operator Spark lacks natively.

``asof_join(left, right)``: for each left row, attach the most recent
right row with the same key and ``right.ts <= left.ts``. The reference's
conditional upsert is the degenerate "as-of latest" case (SURVEY §2.4
note); the general operator is what a delay pipeline needs to ask "what
was the last known schedule/weather/vehicle state at this observation?".

Implementation is the scalable union-tag trick, not a range join:
union both sides with a side tag, sort within key by (ts, side), and
carry the right side's payload forward with ``last_value(ignorenulls)``
over the ordered window — one shuffle on the key, no quadratic candidate
pairs, no per-key driver loops. Right rows at the exact same timestamp as
a left row sort first (side tag 0) so ties are inclusive (matching
DuckDB's ``ASOF JOIN`` >= semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join. Returns every ``left`` row plus ``payload_cols``
    from the latest matching ``right`` row (NULLs when no right row is at
    or before the left timestamp)."""
    overlap = set(left.columns) & set(payload_cols)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")
    lcols = [c for c in left.columns]
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload_cols:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    for c in lcols:
        if c not in {key}:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(
        key, "__ts", "__side", *[f"__p_{c}" for c in payload_cols],
        *[c for c in lcols if c != key],
    ).unionByName(
        r.select(
            key, "__ts", "__side", *[f"__p_{c}" for c in payload_cols],
            *[c for c in lcols if c != key],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in payload_cols
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__c_{c}").alias(c) for c in payload_cols],
    )
    return out
