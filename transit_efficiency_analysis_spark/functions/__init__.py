"""Scalar column-expression libraries.

Everything here is a pure ``pyspark.sql.Column`` expression — JVM-side,
whole-stage-codegen friendly. Python/Pandas UDFs appear only where built-in
operators genuinely cannot express the semantics (none in this module tree
except vector ops, which prefer ``F.aggregate``/``F.zip_with``).
"""

from transit_efficiency_analysis_spark.functions.time import (  # noqa: F401
    EPOCH0,
    epoch_minutes_diff,
    gtfs_time_to_utc,
    is_epoch0,
    local_day_name,
    local_hour,
    null_if_sentinel,
)
from transit_efficiency_analysis_spark.functions.weather import (  # noqa: F401
    kelvin_to_celsius,
    weather_group_for_id,
)
