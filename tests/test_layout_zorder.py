"""Z-order layout semantics: the Morton interleave and the skipping win.

The demo's oracle proves cross-engine bit-parity; these tests prove the
layout does what it is FOR — narrow two-dimensional zone maps — by
comparing probe-overlap counts against a linear single-column layout on
the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo.layout import (
    _BITS,
    _CHUNKS,
    _MORTON,
    q_layout_zorder,
)


def _morton_py(x: int, y: int) -> int:
    m = 0
    for i in range(_BITS):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def test_morton_expression_matches_python_mirror(spark):
    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (4095, 4095), (2048, 1024), (7, 4088)]
    df = spark.createDataFrame(pts, "x LONG, y LONG").select(
        "x", "y", F.expr(_MORTON).alias("m")
    )
    for r in df.collect():
        assert r.m == _morton_py(r.x, r.y), (r.x, r.y)


def test_morton_is_bijective_on_grid(spark):
    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(grid, "x LONG, y LONG").select(
        F.expr(_MORTON).alias("m")
    )
    codes = [r.m for r in df.collect()]
    assert len(set(codes)) == len(grid)
    assert min(codes) == 0 and max(codes) == 32 * 32 - 1


def test_chunks_partition_the_table(spark, sf_dir):
    rows = q_layout_zorder(spark, sf_dir).collect()
    assert len(rows) == _CHUNKS
    assert sorted(r.chunk for r in rows) == list(range(_CHUNKS))
    n = sum(r.n_rows for r in rows)
    # equi-count chunks: sizes differ by at most 1
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert n > 0


def test_zorder_skips_more_than_linear_layout(spark, sf_dir):
    """The point of the exercise: under the Z-order layout the probe
    rectangle must overlap FEWER chunks than under an ``ORDER BY x``
    layout, where every chunk spans the full y range and the probe's
    x-range hits it."""
    from transit_efficiency_analysis_spark.demo.layout import (
        _PX_HI,
        _PX_LO,
        _PY_HI,
        _PY_LO,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    z_rows = q_layout_zorder(spark, sf_dir).collect()
    z_hits = sum(1 for r in z_rows if r.overlaps_probe)

    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (2**_BITS)).cast("long").alias("x"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % (2**_BITS)
        ).cast("long").alias("y"),
    )
    linear = dims.select(
        "x",
        "y",
        F.expr(
            f"((row_number() OVER (ORDER BY x, o_orderkey) - 1)"
            f" * {_CHUNKS}) div (count(*) OVER ())"
        ).alias("chunk"),
    )
    lin_rows = (
        linear.groupBy("chunk")
        .agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .collect()
    )
    lin_hits = sum(
        1
        for r in lin_rows
        if r.min_x <= _PX_HI
        and r.max_x >= _PX_LO
        and r.min_y <= _PY_HI
        and r.max_y >= _PY_LO
    )
    assert z_hits < lin_hits, (z_hits, lin_hits)
