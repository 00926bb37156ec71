"""The delay consolidation — the engine's flagship pipeline.

Re-expresses the reference's one real query (``scripts/diff_times.py:41-108``:
composite-key join of realtime observations against the expanded schedule,
sentinel-aware delay arithmetic, local-time slicing columns) as a single
declarative DataFrame plan. Column-for-column semantics, reproduced exactly
(including the quirks — they are part of the declared behavior):

- missing realtime times are the epoch-0 sentinel; the *time* column maps
  sentinel → NULL but its *diff* column maps sentinel → 0.0, not NULL
  (``diff_times.py:51-59`` — asymmetric on purpose).
- ``average_diff_in_minutes`` is a 4-branch CASE: both present → sum of the
  two second-diffs / 120; one present → that diff / 60; neither → NULL
  (``diff_times.py:69-78``).
- the WHERE drops rows only when both actuals are sentinel AND both
  scheduled epochs are <= 60000 s — with real schedule epochs this is a
  no-op, but it is reproduced verbatim (``diff_times.py:102-106``).
- ``tu.stop_id`` (string) casts to bigint inside the join condition
  (``diff_times.py:101``).
- ``day_type``/``sudbury_hour_of_day`` are the Toronto-local day name and
  hour of the *scheduled* arrival (``diff_times.py:82-91``).

Scale notes: the join shuffles both sides on the 4-column composite key
(Catalyst normalizes the cast onto the build side); at 100 TB both inputs
would be bucketed/partitioned by ``start_date`` so the shuffle partitions by
date-pruned slices and AQE handles skewed trips. Nothing here leaves
whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.functions.time import (
    epoch_minutes_diff,
    epoch_seconds,
    is_epoch0,
    local_day_name,
    local_hour,
    null_if_sentinel,
)

#: threshold in the reference's (effectively no-op) WHERE: 1000 * 60 seconds
SENTINEL_FILTER_EPOCH_CEILING = 1000 * 60


def _epoch(c: Column) -> Column:
    return epoch_seconds(c)


def compute_delays(
    trip_updates: DataFrame, gtfs_data: DataFrame, sort: bool = True
) -> DataFrame:
    """``trip_updates ⋈ gtfs_data`` → ``trip_updates_with_diffs``.

    Inputs follow ``schemas.TRIP_UPDATES`` / ``schemas.GTFS_DATA``; output
    follows ``schemas.TRIP_UPDATES_WITH_DIFFS_COLUMNS`` (FIXTURES.md §6).

    ``sort=True`` reproduces the reference's display ``ORDER BY``
    (``diff_times.py:107``) — semantically immaterial, but it costs a
    global range-exchange; pass ``sort=False`` in a 100 TB materialization
    where storage order doesn't matter (the writer partitions by
    ``start_date`` anyway).
    """
    tu = trip_updates.alias("tu")
    gd = gtfs_data.alias("gd")

    join_cond = (
        (F.col("tu.trip_id") == F.col("gd.trip_id"))
        & (F.col("tu.start_date") == F.col("gd.start_date"))
        & (F.col("tu.stop_sequence") == F.col("gd.stop_sequence"))
        & (F.col("tu.stop_id").cast("long") == F.col("gd.stop_id"))
    )

    joined = tu.join(gd, join_cond, "inner")
    return delays_projection(
        joined,
        lambda c: F.col(f"tu.{c}"),
        lambda c: F.col(f"gd.{c}"),
        sort=sort,
        memo_key="tu_gd",
    )


#: (keep_filter, select_cols) per accessor family — the ~200-operator
#: arithmetic tree costs real py4j construction wall per invocation
#: (functions/exprcache.py rationale); the tree is constant per accessor
#: family, so callers that resolve columns the same way every time pass a
#: ``memo_key`` and the tree is built once per process.
_DELAY_TREES: dict[str, tuple] = {}


def delays_projection(
    joined: DataFrame, tu, gd, sort: bool = True, memo_key: str | None = None
) -> DataFrame:
    """The delay arithmetic over an already-joined relation.

    ``tu`` / ``gd`` are accessors ``name -> Column`` resolving the
    realtime / schedule side's view columns against ``joined`` — either
    plain qualified references (``compute_delays``) or the underlying
    expressions when both sides derive from one shared base relation
    (``testdata_adapter.delays_fused``: the join then runs on the raw
    composite key and every derived column is computed ONCE, above the
    exchange, instead of per side below it — the round-18 shuffle-bytes
    optimization). One definition of the sentinel/diff/CASE arithmetic
    so the two physical forms cannot drift. ``memo_key`` (optional)
    memoizes the constructed tree per accessor family — pass it only
    when the accessors return identical expressions on every call.
    """
    if memo_key is not None and memo_key in _DELAY_TREES:
        keep, cols = _DELAY_TREES[memo_key]
        out = joined.where(keep).select(*cols)
        if sort:
            out = out.orderBy("trip_id", "stop_sequence", "start_date")
        return out
    tu_arr = tu("arrival_time")
    tu_dep = tu("departure_time")
    gd_arr = gd("arrival_time")
    gd_dep = gd("departure_time")

    arr_missing = is_epoch0(tu_arr)
    dep_missing = is_epoch0(tu_dep)

    # verbatim reproduction of the reference's row filter (diff_times.py:102-106)
    keep = ~(
        (arr_missing & (_epoch(gd_arr) <= SENTINEL_FILTER_EPOCH_CEILING))
        & (dep_missing & (_epoch(gd_dep) <= SENTINEL_FILTER_EPOCH_CEILING))
    )

    arr_diff_min = F.when(arr_missing, F.lit(0.0)).otherwise(epoch_minutes_diff(tu_arr, gd_arr))
    dep_diff_min = F.when(dep_missing, F.lit(0.0)).otherwise(epoch_minutes_diff(tu_dep, gd_dep))

    avg_diff = (
        F.when(
            ~arr_missing & ~dep_missing,
            ((_epoch(tu_arr) - _epoch(gd_arr)) + (_epoch(tu_dep) - _epoch(gd_dep))) / F.lit(120.0),
        )
        .when(arr_missing & ~dep_missing, epoch_minutes_diff(tu_dep, gd_dep))
        .when(~arr_missing & dep_missing, epoch_minutes_diff(tu_arr, gd_arr))
        .otherwise(F.lit(None).cast("double"))
    )

    cols = (
            tu("trip_id").alias("trip_id"),
            tu("start_date").alias("start_date"),
            tu("stop_sequence").alias("stop_sequence"),
            tu("stop_id").cast("long").alias("stop_id"),
            gd("route_id").alias("route_id"),
            gd("stop_name").alias("stop_name"),
            gd("route_long_name").alias("route_long_name"),
            null_if_sentinel(tu_arr).alias("actual_arrival_time"),
            gd_arr.alias("scheduled_arrival_time"),
            arr_diff_min.alias("arrival_time_diff_in_minutes"),
            null_if_sentinel(tu_dep).alias("actual_departure_time"),
            gd_dep.alias("scheduled_departure_time"),
            dep_diff_min.alias("departure_time_diff_in_minutes"),
            avg_diff.alias("average_diff_in_minutes"),
            tu("weather_group").alias("weather_group"),
            tu("weather_description").alias("weather_description"),
            tu("temperature").alias("temperature"),
            local_day_name(gd_arr).alias("day_type"),
            local_hour(gd_arr).alias("sudbury_hour_of_day"),
            gd("geo_coordinates").alias("geo_coordinates"),
            tu("created_at").alias("created_at"),
            tu("updated_at").alias("updated_at"),
    )
    if memo_key is not None:
        _DELAY_TREES[memo_key] = (keep, cols)
    out = joined.where(keep).select(*cols)
    if sort:
        # display-order only; storage order is immaterial (diff_times.py:107)
        out = out.orderBy("trip_id", "stop_sequence", "start_date")
    return out
