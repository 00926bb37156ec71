"""Weather enrichment scalar functions (SURVEY.md §2.2 case-bucket, expr-math).

The reference maps OpenWeatherMap condition ids to 8 coarse groups with an
if/elif chain (``scripts/realtime_extractor.py:69-84``) and converts Kelvin
to Celsius (``:64-67``). Both are pure column expressions here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: (lower-inclusive, upper-exclusive, group) — OpenWeatherMap condition id ranges
WEATHER_ID_GROUPS: list[tuple[int, int, str]] = [
    (200, 300, "Thunderstorm"),
    (300, 400, "Drizzle"),
    (500, 600, "Rain"),
    (600, 700, "Snow"),
    (700, 800, "Atmosphere"),
    (800, 801, "Clear"),
    (801, 900, "Clouds"),
]


def weather_group_for_id(id_col: Column | str) -> Column:
    """OpenWeatherMap condition id → coarse group name; 'Unknown' otherwise."""
    c = _c(id_col)
    expr: Column | None = None
    for lo, hi, name in WEATHER_ID_GROUPS:
        cond = (c >= lo) & (c < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert expr is not None
    return expr.otherwise(F.lit("Unknown"))


def kelvin_to_celsius(temp_col: Column | str) -> Column:
    """Kelvin → Celsius (reference ``realtime_extractor.py:64-67``)."""
    return _c(temp_col) - F.lit(273.15)
