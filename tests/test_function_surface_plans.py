"""Shuffle budgets for the round-7 function-surface demos: the docstring
claims ("scan-fused", "one key shuffle") must be visible in the plan."""

from __future__ import annotations

import pytest

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.plans import (
    assert_no_python_row_udf,
    count_shuffles,
    physical_plan,
)

#: demo -> max exchanges allowed (0 = pure map over the scan)
_BUDGETS = {
    "q_semi_variant": 0,
    "q_semi_map_ops": 0,
    "q_text_regex_extract": 0,
    "q_array_setops": 0,
    "q_ts_calendar": 0,
    "q_expr_try_arith": 0,
    "q_agg_bitwise": 1,
    "q_agg_grouping_id": 1,
    "q_agg_listagg": 1,
    "q_window_cume_nth": 1,
    # countDistinct expands to a two-phase aggregate per distinct column
    "q_sql_collation": 3,
}


@pytest.mark.parametrize("name,budget", sorted(_BUDGETS.items()))
def test_shuffle_budget(spark, sf_dir, name, budget):
    df = load_registry()[name].fn(spark, sf_dir)
    got = count_shuffles(df)
    assert got <= budget, f"{name}: {got} exchanges > budget {budget}"
    assert_no_python_row_udf(df)


def test_map_side_demos_have_no_aggregate(spark, sf_dir):
    """The 0-shuffle demos must be pure projections — not even a
    map-side partial aggregate."""
    for name in ("q_semi_map_ops", "q_text_regex_extract",
                 "q_ts_calendar", "q_expr_try_arith"):
        plan = physical_plan(load_registry()[name].fn(spark, sf_dir))
        assert "HashAggregate" not in plan, name
