"""Round-17 ADVICE fixes.

1. Arrow twins' element-NULL checks must be slice-aware:
   ``col.values`` is the UNSLICED child array, so on a sliced batch
   ``.values.null_count`` counts NULLs OUTSIDE the batch window and
   false-positives on clean in-window rows; ``col.flatten()`` respects
   the slice (ADVICE r16 #1).
2. ``_const_key``'s constant-by-construction partition key must stay
   constant for FRACTIONAL id columns: ``pmod(2.5, 1) = 0.5`` is not
   0, so a double/decimal id would split the single-partition seed
   window and collide the row_number-derived cell ids (ADVICE r16 #2).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.similarity import (
    _const_key,
    _list_matrix,
    ivf_centroids,
)


def _sliced_list_col(values, slice_from):
    """list<double> array sliced so rows before ``slice_from`` fall
    outside the window (mimics an Arrow batch Spark hands to
    mapInArrow as a slice of a larger record batch)."""
    arr = pa.array(values, type=pa.list_(pa.float64()))
    return arr.slice(slice_from)


def test_pyarrow_values_vs_flatten_slice_semantics():
    """Behavior pin for the pyarrow fact the fix relies on: ``.values``
    ignores the slice (counts the out-of-window NULL), ``flatten()``
    honors it. If a pyarrow upgrade changes either, the twins' NULL
    contracts need re-review."""
    col = _sliced_list_col([[1.0, None], [2.0, 3.0], [4.0, 5.0]], 1)
    assert col.null_count == 0
    assert col.values.null_count == 1  # the unsliced child still sees it
    assert col.flatten().null_count == 0  # slice-aware


def test_list_matrix_ignores_out_of_window_element_null():
    """A NULL element BEFORE the slice window must not reject the clean
    in-window rows (pre-fix: spurious ValueError)."""
    col = _sliced_list_col([[1.0, None], [2.0, 3.0], [4.0, 5.0]], 1)
    out = _list_matrix(col)
    assert out.shape == (2, 2)
    assert out.tolist() == [[2.0, 3.0], [4.0, 5.0]]


def test_list_matrix_still_rejects_in_window_element_null():
    col = _sliced_list_col([[1.0, 2.0], [None, 3.0], [4.0, 5.0]], 1)
    with pytest.raises(ValueError, match="NULL vector COMPONENTS"):
        _list_matrix(col)


def test_list_matrix_still_rejects_in_window_list_null():
    arr = pa.array([[1.0, 2.0], None, [4.0, 5.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="NULL vectors"):
        _list_matrix(arr.slice(1))


def test_const_key_integral_ids_keep_verbatim_pmod(spark):
    """Plan-compat pin: bigint ids (every registered demo) keep the
    original ``pmod(id, 1)`` expression — the executed demo plans are
    byte-identical across the ADVICE r16 #2 fix."""
    df = spark.createDataFrame([(1,)], "vec_id long").select(
        F.col("vec_id").alias("sid")
    )
    expr = str(_const_key(df.select(F.col("sid").alias("vec_id")), "vec_id", "sid"))
    assert "length" not in expr
    assert "pmod" in expr


def test_const_key_fractional_ids_route_through_length_form(spark):
    df = spark.createDataFrame([(1.5,)], "vec_id double")
    expr = str(_const_key(df, "vec_id", "sid"))
    assert "length" in expr


def test_ivf_centroids_double_ids_keep_single_seed_partition(spark):
    """End-to-end: fractional ids must still yield exactly n_centroids
    DISTINCT cell ids 0..n-1. Pre-fix, pmod(id, 1) took distinct
    fractional values per row, the seed window split into one
    partition per fraction, and row_number restarted in each —
    colliding cell ids."""
    rows = [(i + 0.5, [float(i), float(9 - i), 1.0, 2.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id double, embedding array<double>")
    cents = ivf_centroids(df, n_centroids=4).collect()
    cells = sorted(r.cell for r in cents)
    assert cells == [0, 1, 2, 3]


def test_ivf_centroids_decimal_ids_keep_single_seed_partition(spark):
    """DECIMAL ids are NumericType but not IntegralType — the exact
    class ADVICE r16 #2 flags (fractional decimal splits the window)."""
    rows = [(i + 0.5, [float(i), 1.0]) for i in range(8)]
    df = spark.createDataFrame(
        rows, "vec_id double, embedding array<double>"
    ).withColumn("vec_id", F.col("vec_id").cast("decimal(10,2)"))
    cents = ivf_centroids(df, n_centroids=3).collect()
    assert sorted(r.cell for r in cents) == [0, 1, 2]
