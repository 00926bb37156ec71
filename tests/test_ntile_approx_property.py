"""Property tests for q_window_ntile_approx on adversarial inputs.

The orders-table parity test (test_window_ntile_approx.py) pins behavior
on the driver's data; these properties pin the CONTRACT on generated
data the histogram split must survive at 100 TB: plateaus (heavy ties —
ntile splits them, a bin cannot), value gaps (empty bins), negative
values, tiny corpora. The demo functions are exercised verbatim by
materializing each generated corpus as an orders.parquet in a temp
sf_dir. ``cut_within_gk`` is deliberately NOT asserted here: its 2-bin
tolerance is a property of gap-bounded data like o_totalprice (the
oracle asserts it on the driver's tables), not of arbitrary
distributions — a rank-adjacent value gap wider than two bins makes it
legitimately False.
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.demo.windows import _NTILE_BIN_W

values_strategy = st.lists(
    st.one_of(
        st.integers(min_value=-50_000, max_value=500_000),  # incl. negatives
        st.sampled_from([0, 1000, 1001, 99_999, 100_000]),  # edge/plateau mass
    ),
    min_size=1,
    max_size=300,
)

_COUNTER = [0]


def _sf_dir_for(spark, tmp_root, values):
    _COUNTER[0] += 1
    sf_dir = os.path.join(tmp_root, f"gen_{_COUNTER[0]}")
    os.makedirs(sf_dir, exist_ok=True)
    rows = [(float(v), i + 1) for i, v in enumerate(values)]
    spark.createDataFrame(
        rows, "o_totalprice double, o_orderkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    return sf_dir


@settings(max_examples=10, deadline=None)
@given(values=values_strategy)
def test_ntile_approx_contract_on_generated_data(
    spark, tmp_path_factory, values
):
    tmp_root = str(tmp_path_factory.mktemp("ntileprop"))
    sf_dir = _sf_dir_for(spark, tmp_root, values)
    out = sorted(
        load_registry()["q_window_ntile_approx"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    # every row lands in exactly one decile
    assert sum(r["n_orders"] for r in out) == len(values)
    # emitted deciles are a subset of 1..10 (plateau-merged bins may skip)
    assert all(1 <= r["decile"] <= 10 for r in out)
    for r in out:
        # the depth bound IS the contract: |err| <= boundary-bin
        # populations + 1, emitted as a checked verdict
        assert r["depth_ok"] is True, r
        if r["decile"] < 10:
            # decile contents respect the bin edge exactly
            assert r["upper_cut"] is not None
            assert r["max_price"] < r["upper_cut"], r
    # bin-granularity monotonicity: deciles never overlap in value space
    for a, b in zip(out, out[1:]):
        assert a["max_price"] <= b["min_price"], (a, b)
