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

All payload columns travel inside ONE struct with a non-null marker
field, and ``last(ignorenulls)`` carries the struct. That keeps row
semantics: every output payload comes from the *same* right row, and a
right row whose payload value is NULL still wins over an older non-NULL
one (NULL fields inside a non-null struct propagate) — matching
DuckDB/pandas ASOF row semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: int | float | None = None,
) -> DataFrame:
    """Backward as-of join. Returns every ``left`` row plus ``payload_cols``
    from the latest matching ``right`` row (NULLs when no right row is at
    or before the left timestamp).

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``'s
    ``tolerance``): a carried right row older than the bound yields NULL
    payloads, exactly as if no match existed. The matched right
    timestamp travels inside the carried struct, so the bound is applied
    per-row after the single carry-forward window — same one-shuffle
    plan, no extra join."""
    overlap = set(left.columns) & set(payload_cols)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {sorted(overlap)}")
    lcols = [c for c in left.columns]
    payload_type = T.StructType(
        [T.StructField("__m", T.BooleanType(), False)]
        + [T.StructField("__rts", T.DoubleType(), True)]
        + [T.StructField(c, right.schema[c].dataType, True) for c in payload_cols]
    )
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__p", F.lit(None).cast(payload_type))
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.lit(True).alias("__m"),
            F.col(right_ts).cast("timestamp").cast("double").alias("__rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).cast(payload_type).alias("__p"),
    )
    for c in lcols:
        if c not in {key}:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "__ts", "__side", "__p", *[c for c in lcols if c != key]]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__c")
    )
    if tolerance_seconds is not None:
        fresh = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__c").getField("__rts")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.withColumn(
            "__c", F.when(fresh, F.col("__c"))  # otherwise NULL: stale match dropped
        )
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col("__c").getField(c).alias(c) for c in payload_cols],
    )
    return out
