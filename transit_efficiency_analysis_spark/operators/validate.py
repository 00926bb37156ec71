"""Data-quality expectation checks — the ingestion gate for a 100 TB lake.

The Great-Expectations/dbt-test shape re-expressed Spark-first: each table's
checks are folded into ONE aggregation pass (conditional-sum counters —
map-side partial agg, one tiny shuffle per table, never one job per check),
then unpivoted to one (check_name, n_violations, passed) row per check with
``stack``. Referential integrity is a broadcast-able anti-join count.

Not present in the reference repo (its last line of defense was Postgres
PK constraints, SURVEY §5); this is the operational-hardening extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_counters(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One aggregation pass over ``df`` evaluating every check.

    ``checks`` maps check name → boolean Column that is TRUE for a
    VIOLATING row. Returns one row per check:
    ``(check_name, n_violations, passed)``.
    """
    agg = df.agg(
        *[
            # coalesce: sum() over ZERO rows is NULL, and an empty batch
            # must report 0 violations / passed, not NULL / NULL
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(name)
            for name, cond in checks.items()
        ]
    )
    pairs = ", ".join(f"'{name}', `{name}`" for name in checks)
    return agg.select(
        F.expr(f"stack({len(checks)}, {pairs}) as (check_name, n_violations)")
    ).select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def uniqueness_check(df: DataFrame, name: str, *key_cols: str) -> DataFrame:
    """Duplicate-key count for a candidate primary key:
    ``count(*) − count(DISTINCT key)`` — one aggregate, no self-join."""
    agg = df.agg(
        (F.count(F.lit(1)) - F.countDistinct(*key_cols)).cast("long").alias("n")
    )
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str
) -> DataFrame:
    """Orphaned-foreign-key count via LEFT ANTI join (the parent key set
    is broadcast when small; at scale AQE picks the strategy)."""
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    agg = orphans.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return agg.select(
        F.lit(name).alias("check_name"),
        F.col("n").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )
