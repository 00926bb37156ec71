"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
``session.py``) handles most skew at runtime; explicit salting remains the
tool when one side must *replicate* (e.g. a hot trip_id holding 10% of a
100 TB realtime feed joined against its schedule rows). Semantics-preserving:
the salted join equals the plain join row-for-row (tested in
tests/test_skew.py).

Left side: each row gets a random-ish but *deterministic* salt in
[0, salt_buckets) derived from a unique column (no RNG — reproducible
plans). Right side: each row is replicated once per salt bucket. The join
key becomes (key, salt), spreading a hot key over ``salt_buckets``
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    left_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` with the left side salted and
    the right side replicated ``salt_buckets`` times.

    ``left_unique_col`` seeds the deterministic salt (defaults to the key
    itself plus a monotonic id — prefer a real unique column so the salt is
    stable across runs and plans).

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated once per salt bucket, so a right/full outer join would emit
    each unmatched right row ``salt_buckets`` times instead of once.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r} "
            "(right/full would duplicate unmatched right rows per salt bucket)"
        )
    if left_unique_col is None:
        left = left.withColumn("__uniq", F.monotonically_increasing_id())
        left_unique_col = "__uniq"
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(left_unique_col)), F.lit(salt_buckets)).cast("int")
    )
    salts = right.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("__salt"))
    replicated_right = right.crossJoin(F.broadcast(salts))
    joined = salted_left.join(replicated_right, [key, "__salt"], how)
    return joined.drop("__salt", "__uniq")
