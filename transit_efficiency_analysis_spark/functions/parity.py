"""Guarded decimal narrowing for oracle-parity output columns.

Demo queries emit exact-decimal aggregates through a
``DECIMAL(18,s) -> DOUBLE`` hop: DuckDB's decimal->double conversion is
correctly rounded only for int64-backed decimals (precision <= 18), so
bit-parity with the oracle requires the narrow intermediate. The sums
themselves always run at wide precision (Spark widens sum(DECIMAL(p,s))
to p+10; DuckDB to 38) — only the finished total is narrowed.

The hazard (VERDICT r3 "What's wrong #3"): under Spark's default
non-ANSI casting, a total that no longer fits 18-s integral digits
(TPC-H sum_base_price crosses 1e14 around SF ~400) narrows to NULL
silently. ``parity_double`` closes that hole: it raises at run time when
the wide total was non-NULL but the narrow cast overflowed, instead of
emitting NULL. DuckDB needs no guard — its overflowing cast errors on
its own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parity_double(total: Column, scale: int) -> Column:
    """Narrow a wide decimal aggregate to ``DECIMAL(18,scale)`` then
    ``DOUBLE``, raising (not NULL-ing) if the narrowing overflows.

    Alias the result yourself; pair with oracle SQL
    ``CAST(CAST(sum(...) AS DECIMAL(18,scale)) AS DOUBLE)``.
    """
    narrow = total.cast(f"decimal(18,{scale})")
    overflowed = total.isNotNull() & narrow.isNull()
    return (
        F.when(
            overflowed,
            F.raise_error(
                F.concat(
                    F.lit(f"parity_double: total overflows DECIMAL(18,{scale}): "),
                    total.cast("string"),
                )
            ).cast(f"decimal(18,{scale})"),
        )
        .otherwise(narrow)
        .cast("double")
    )
