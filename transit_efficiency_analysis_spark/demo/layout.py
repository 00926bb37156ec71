"""Data-layout demos: Z-order (Morton) clustering for multi-column skipping.

Min/max zone-map pruning — the mechanism behind ``q_sink_partitioned``'s
partition pruning and parquet row-group skipping — only works on columns
the data is sorted by. Sorting by ``(a, b)`` gives perfect pruning on
``a`` and none on ``b``; interleaving the bits of both keys into one
Morton code and sorting by THAT gives useful pruning on EITHER column —
the standard multi-dimensional clustering trick (Z-ordering, as in public
lakehouse ``OPTIMIZE ZORDER BY`` implementations). The whole code is
integer shift/mask arithmetic, evaluated identically by Spark and DuckDB,
so the oracle re-derives the entire layout bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table

_BITS = 12  # 12 bits per dimension -> 24-bit Morton code
_CHUNKS = 16  # emulated files: equi-count chunks of the z-ordered table

#: Bit-interleave ``x`` (even bits) and ``y`` (odd bits) — pure
#: shift/mask/add arithmetic shared verbatim by the Spark expression and
#: the DuckDB oracle, so both engines compute the identical BIGINT code.
_MORTON = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_BITS)
)

# probe rectangle for the skipping verdict: a selective range on BOTH
# dimensions, the query shape Z-ordering exists to serve
_PX_LO, _PX_HI = 100, 400
_PY_LO, _PY_HI = 700, 1400


@demo(
    "q_layout_zorder",
    sql=f"""
    WITH dims AS (
        SELECT o_orderkey,
               CAST(o_custkey % {2 ** _BITS} AS BIGINT) AS x,
               CAST(datediff('day', DATE '1992-01-01', o_orderdate)
                    % {2 ** _BITS} AS BIGINT) AS y
        FROM orders
    ),
    coded AS (SELECT *, {_MORTON} AS morton FROM dims),
    chunked AS (
        SELECT *,
               ((row_number() OVER (ORDER BY morton, o_orderkey) - 1)
                * {_CHUNKS}) // (count(*) OVER ()) AS chunk
        FROM coded
    )
    SELECT CAST(chunk AS BIGINT) AS chunk,
           count(*) AS n_rows,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y,
           (min(x) <= {_PX_HI} AND max(x) >= {_PX_LO}
            AND min(y) <= {_PY_HI} AND max(y) >= {_PY_LO}) AS overlaps_probe
    FROM chunked
    GROUP BY chunk
    """,
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering quality report: orders are laid out by the
    Morton interleave of (customer bucket, order-day bucket), split into
    {_CHUNKS} equi-count chunks (stand-ins for files), and each chunk
    reports its min/max zone map per dimension plus whether a
    two-dimensional probe rectangle could skip it. Under a linear
    ``ORDER BY x`` layout every chunk spans the full ``y`` range (no
    skipping on ``y``); under the Z-order layout both zone maps are
    narrow, so most chunks report ``overlaps_probe = false`` — the
    measurable win multi-dimensional clustering buys. At 100 TB the same
    code feeds ``repartitionByRange(morton).sortWithinPartitions(morton)``
    before the parquet write and the zone maps land in file footers for
    free; the global row_number here exists only to pin deterministic
    chunk boundaries for the oracle (production uses the range
    partitioner's sampled bounds instead)."""
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        "o_orderkey",
        (F.col("o_custkey") % (2**_BITS)).cast("long").alias("x"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % (2**_BITS)
        ).cast("long").alias("y"),
    )
    coded = dims.select("*", F.expr(_MORTON).alias("morton"))
    chunked = coded.select(
        "x",
        "y",
        F.expr(
            f"((row_number() OVER (ORDER BY morton, o_orderkey) - 1)"
            f" * {_CHUNKS}) div (count(*) OVER ())"
        ).alias("chunk"),
    )
    overlaps = (
        (F.min("x") <= _PX_HI)
        & (F.max("x") >= _PX_LO)
        & (F.min("y") <= _PY_HI)
        & (F.max("y") >= _PY_LO)
    )
    return chunked.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        overlaps.alias("overlaps_probe"),
    )
