"""Plan-inspection helpers: assert the physical plan is the one we want.

Correctness says *what* was computed; these helpers pin *how*: filters
pushed into the parquet scan, projections pruned to the read schema, small
dimensions broadcast, the hot path inside whole-stage codegen, and no
row-at-a-time Python in a plan that should be JVM-only. Used by
tests/test_plans.py so a regression that silently de-optimizes a pipeline
fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted executed plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output (includes PushedFilters / ReadSchema)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed and any(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, table_fragment: str, allowed: set[str]) -> None:
    """Assert the scan of ``table_fragment`` reads no columns beyond
    ``allowed`` (column pruning reached the reader)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            # ReadSchema: struct<a:bigint,b:string>
            cols = {
                c.split(":")[0]
                for c in line.split("struct<", 1)[-1].rstrip(">").split(",")
                if c
            }
            extra = cols - allowed
            assert not extra, f"scan reads unexpected columns {extra}: {line}"
            return
    raise AssertionError(f"no ReadSchema line found for {table_fragment!r}:\n{plan}")


def assert_partition_pruned(df: DataFrame, column: str) -> None:
    """Assert a predicate on ``column`` became a PartitionFilter (directory
    pruning — the scan never opens non-matching partitions)."""
    plan = formatted_plan(df)
    lines = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert any(column in line for line in lines), (
        f"no PartitionFilters on {column!r}; lines: {lines}\n{plan}"
    )


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """Assert at least ``min_count`` broadcast joins in the physical plan."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, found {n}:\n{plan}"


def assert_no_python_row_udf(df: DataFrame) -> None:
    """Assert no row-at-a-time Python evaluation in the plan
    (BatchEvalPython = the slow path; Arrow-batched stages are allowed)."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, f"row-at-a-time Python UDF in plan:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Assert at least one whole-stage-codegen span exists.

    Under AQE codegen subtrees exist only once stages are finalized, and
    only for *this* DataFrame's query execution — so execute it first with
    ``collect()`` (``count()`` would build a different plan), then read the
    "codegen" explain.
    """
    df.collect()  # finalize AQE stages on this exact query execution
    out = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    first = out.splitlines()[0] if out else ""
    assert "WholeStageCodegen subtrees" in first and not first.strip().startswith(
        "Found 0"
    ), f"no WholeStageCodegen subtrees: {first}"


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    plan = physical_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )