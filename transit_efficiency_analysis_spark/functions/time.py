"""Date/time scalar functions — the reference's richest scalar area.

Re-expresses SURVEY.md §2.3 as pure column expressions (no UDFs):

- ``gtfs_time_to_utc`` — the engine's signature function: GTFS ``HH:MM:SS``
  clock strings where H may be >= 24 (service past midnight) plus a
  ``yyyyMMdd`` service date, localized in a feed timezone and converted to
  UTC. Semantics of reference ``scripts/historical_extractor.py:26-37``
  (hours//24 day rollover, hours%24 wall clock, tz-localize, UTC convert).
- epoch-0 sentinel helpers (``is_epoch0``, ``null_if_sentinel``) for the
  reference's missing-time convention (``README.md:131-132``,
  ``scripts/diff_times.py:51-78``).
- local-time extractors (``local_day_name``, ``local_hour``) replacing the
  7-branch ``CASE EXTRACT(DOW ...)`` at ``scripts/diff_times.py:82-91``.

All functions take and return ``Column``; strings are accepted and resolved
with ``F.col`` for convenience.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TZ = "America/Toronto"

def EPOCH0() -> Column:
    """The reference's missing-time sentinel: epoch 0 (1970-01-01T00:00:00Z).

    A function (not a module constant) because building a Column requires an
    active SparkContext.
    """
    return F.timestamp_seconds(F.lit(0))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def gtfs_time_to_utc(
    date_col: Column | str,
    time_col: Column | str,
    tz: str = DEFAULT_TZ,
) -> Column:
    """GTFS (``yyyyMMdd`` date, ``HH:MM:SS`` time with H possibly >= 24) → UTC ts.

    A clock value of ``"25:15:00"`` on service date D means D+1 01:15 local.
    Implemented as: split the clock; roll the date forward ``H // 24`` days;
    build the local wall-clock timestamp with ``make_timestamp``; convert the
    named zone to UTC with ``to_utc_timestamp`` (DST-aware; nonexistent local
    times resolve per java.time gap rules, matching the zone's standard
    behavior — the reference's pandas ``tz_localize`` would raise instead,
    so our engine is strictly more total).

    Pure column expression → stays inside whole-stage codegen; at 100 TB this
    is a map-only stage with zero Python involvement.
    """
    d, t = _c(date_col), _c(time_col)
    parts = F.split(t, ":")
    h = parts.getItem(0).cast("int")
    m = parts.getItem(1).cast("int")
    s = parts.getItem(2).cast("int")
    base_date = F.to_date(d, "yyyyMMdd")
    rolled = F.date_add(base_date, F.floor(h / 24).cast("int"))
    local_ts = F.make_timestamp(
        F.year(rolled), F.month(rolled), F.dayofmonth(rolled), h % 24, m, s.cast("decimal(8,6)")
    )
    return F.to_utc_timestamp(local_ts, tz)


def unix_to_utc(seconds_col: Column | str) -> Column:
    """Unix epoch seconds → UTC timestamp (reference ``realtime_extractor.py:107-108``)."""
    return F.timestamp_seconds(_c(seconds_col))


def yyyymmdd_to_date(date_col: Column | str) -> Column:
    """``yyyyMMdd`` string → DATE (reference ``historical_extractor.py:30,74``)."""
    return F.to_date(_c(date_col), "yyyyMMdd")


def epoch_seconds(ts_col: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM ts)`` as a double with fractional seconds.

    ``cast('double')`` (not ``unix_timestamp``, which truncates to whole
    seconds) — Postgres/DuckDB ``epoch()`` keep microseconds, and parity
    matters for sub-second timestamps.
    """
    return _c(ts_col).cast("double")


def is_epoch0(ts_col: Column | str) -> Column:
    """True when the timestamp is the epoch-0 'missing' sentinel
    (``EXTRACT(EPOCH FROM ts) = 0`` in reference ``diff_times.py:52`` etc.)."""
    return epoch_seconds(ts_col) == 0


def null_if_sentinel(ts_col: Column | str) -> Column:
    """Sentinel → NULL, else passthrough (reference ``diff_times.py:51-54``)."""
    c = _c(ts_col)
    return F.when(is_epoch0(c), F.lit(None).cast("timestamp")).otherwise(c)


def epoch_minutes_diff(a: Column | str, b: Column | str) -> Column:
    """Timestamp difference in fractional minutes:
    ``EXTRACT(EPOCH FROM (a-b))/60`` (reference ``diff_times.py:58,67``)."""
    return (epoch_seconds(a) - epoch_seconds(b)) / F.lit(60.0)


def to_local(ts_col: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """UTC timestamp → local wall-clock timestamp in ``tz``."""
    return F.from_utc_timestamp(_c(ts_col), tz)


def local_day_name(ts_col: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """Full day-of-week name ('Sunday'..'Saturday') of a UTC ts in local tz.

    One expression replaces the reference's 7-branch CASE over
    ``EXTRACT(DOW ...)`` (``diff_times.py:82-90``).
    """
    return F.date_format(to_local(ts_col, tz), "EEEE")


def local_hour(ts_col: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """Hour-of-day (0-23) of a UTC timestamp in local tz
    (reference ``diff_times.py:91`` → ``sudbury_hour_of_day``)."""
    return F.hour(to_local(ts_col, tz))
