"""q_window_ntile_approx: the scale-safe equi-depth split must (a) carry
no global sort of the data in its plan, and (b) reproduce the exact
global-sort ntile contract within the documented one-bin tolerance."""

from __future__ import annotations

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.demo.windows import _NTILE_BIN_W
from transit_efficiency_analysis_spark.plans import (
    assert_no_python_row_udf,
    physical_plan,
)


def test_plan_has_no_global_data_sort(spark, sf_dir):
    """The exact demo's signature — ntile over an unpartitioned
    total-order window — must be absent; the only Window in the approx
    plan is the cumulative sum over the bounded histogram."""
    df = load_registry()["q_window_ntile_approx"].fn(spark, sf_dir)
    plan = physical_plan(df)
    # NB "ntile" alone would match percentile_approx; the window function
    # renders as ntile(10) in the plan
    assert "ntile(10)" not in plan, f"approx variant must not use ntile:\n{plan}"
    # every Window node must sit on the histogram side (orders by `bin`,
    # the bounded relation), never on a data column
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "o_totalprice" not in line, (
                f"window over the data relation (global sort):\n{line}"
            )
    assert_no_python_row_udf(df)


def test_assignment_is_broadcast(spark, sf_dir):
    """Cut bins reach the rows by broadcast — the assignment pass must
    not shuffle the orders relation."""
    df = load_registry()["q_window_ntile_approx"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_matches_exact_ntile_within_one_bin(spark, sf_dir):
    """Depth and boundary parity vs the exact contract: every approx
    decile boundary within one bin width of the exact ntile boundary,
    every depth within the boundary-bin tolerance (depth_ok TRUE)."""
    reg = load_registry()
    approx = {
        r["decile"]: r
        for r in reg["q_window_ntile_approx"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["decile"]: r for r in reg["q_window_ntile"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact) == set(range(1, 11))
    n_total = sum(r["n_orders"] for r in approx.values())
    assert n_total == sum(r["n_orders"] for r in exact.values())
    for k in range(1, 11):
        a, e = approx[k], exact[k]
        assert a["depth_ok"] is True, (k, a)
        if k < 10:
            assert a["cut_within_gk"] is True, (k, a)
            # the exact boundary element (rank ceil(k·n/10)) lives in the
            # cut bin, so the approx upper boundary sits within one bin
            # of it (2 bins of slack for ntile's ±1-rank ceil/floor split
            # on n not divisible by 10)
            assert abs(a["upper_cut"] - e["max_price"]) <= 2 * _NTILE_BIN_W, (
                k,
                a["upper_cut"],
                e["max_price"],
            )
            # decile contents respect the bin edge exactly
            assert a["max_price"] < a["upper_cut"]
        if k > 1:
            # bin-granularity membership: approx decile k starts at or
            # above the previous cut edge, and never below the exact
            # decile's start by more than the rank slack (a value-space
            # gap above the cut bin can push it arbitrarily HIGHER than
            # the exact start — that is the documented bin-granularity
            # tolerance, not an error)
            assert a["min_price"] >= approx[k - 1]["upper_cut"]
            assert a["min_price"] >= e["min_price"] - _NTILE_BIN_W
