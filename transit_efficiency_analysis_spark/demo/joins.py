"""Join demos (SURVEY.md §2.4) — star-schema denormalization and the
composite-key join, plus the semi/anti/outer variants the engine supports
beyond the reference.

Aggregates over doubles are summed in DECIMAL (per-row cast first) so the
total is order-independent and bit-equal across engines; derived doubles are
computed from those exact totals.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_join_star",
    sql="""
    SELECT r_name AS region_name, n_name AS nation_name,
           count(*) AS n_lineitems,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-star: multi-step equi-join chain denormalizing a star schema
    (``historical_extractor.py:63-67``). Dimensions are broadcast — no
    shuffle of the fact table for the join itself; the only shuffle is the
    final aggregation on (region, nation), which is tiny after map-side
    partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            # cast factors to decimal BEFORE multiplying: a double product cast
            # afterwards can land on a .xxx5 shortest-repr boundary where Spark
            # (HALF_UP on shortest repr) and DuckDB (round of true value) differ.
            # The SUM stays decimal (order-independent); only the final projected
            # value goes to DOUBLE, via DECIMAL(18,4) so both engines perform a
            # correctly-rounded int64-backed conversion.
            parity_double(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (1 - F.col("l_discount")).cast("decimal(4,2)")
                ),
                4,
            ).alias("revenue"),
        )
    )


@demo(
    "q_join_diff",
    sql="""
    SELECT o_orderkey, l_linenumber, o_orderpriority, l_quantity,
           (epoch(l_shipdate) - epoch(o_orderdate)) / 86400 AS ship_lag_days
    FROM lineitem
    JOIN orders ON CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) = o_orderkey
                AND l_linenumber >= 1
    """,
)
def q_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-diff: equi-join with a cast inside the join condition
    (``diff_times.py:95-101`` — ``tu.stop_id::bigint = gd.stop_id``)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey.cast("string").cast("long") == o.o_orderkey) & (
        li.l_linenumber >= 1
    )
    lag_days = (F.col("l_shipdate").cast("double") - F.col("o_orderdate").cast("double")) / 86400
    return li.join(o, cond, "inner").select(
        "o_orderkey",
        "l_linenumber",
        "o_orderpriority",
        "l_quantity",
        lag_days.alias("ship_lag_days"),
    )


@demo(
    "q_join_semi",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi join (EXISTS): customers with at least one large order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@demo(
    "q_join_anti",
    sql="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-anti join (NOT EXISTS): customers with no quarter-million order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@demo(
    "q_join_outer",
    sql="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 300000
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-outer join with a pushed non-key predicate in the ON clause."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@demo(
    "q_join_bucketed",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice, o_orderstatus
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 50 = 3
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-bucketed: both sides written ``bucketBy`` on the join key, so
    the recurring join plans as a sort-merge join over co-located bucketed
    scans with ZERO shuffle exchanges — the storage-level strategy that
    amortizes the 100 TB join's shuffle into a one-time layout. Asserted
    in-demo: the plan must contain a SortMergeJoin (a broadcast would
    trivially have no exchange) and no Exchange at all."""
    import shutil
    from urllib.parse import unquote, urlparse

    from transit_efficiency_analysis_spark.plans import count_shuffles, physical_plan

    db = f"teas_bucketed_{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}"
    for t in ("li", "o"):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
    # DROP TABLE only clears the CURRENT metastore. A caller-owned session
    # (the driver's) starts a fresh in-memory derby each run, so a table dir
    # left by a PREVIOUS run's warehouse is invisible to the catalog yet
    # still trips LOCATION_ALREADY_EXISTS on saveAsTable (CORRECTNESS_r14's
    # q_join_bucketed red row). Resolve the live session's warehouse dir —
    # NOT a hardcoded path — and clear the stale db location on local
    # filesystems.
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parsed = urlparse(wh)
    if parsed.scheme in ("", "file"):
        # Spark reports the warehouse as a qualified URI: percent-decode
        # the path (a %20 left encoded would rmtree the wrong dir and
        # resurface the r14 crash on warehouses with spaces)
        shutil.rmtree(
            os.path.join(unquote(parsed.path) or wh, f"{db}.db"),
            ignore_errors=True,
        )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 3)
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{db}.li")
    )
    (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{db}.o")
    )
    lb = spark.table(f"{db}.li")
    ob = spark.table(f"{db}.o").hint("merge")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_totalprice", "o_orderstatus"
    )
    assert count_shuffles(joined) == 0, "bucketed join must not shuffle"
    assert "SortMergeJoin" in physical_plan(joined), "expected SMJ over buckets"
    return joined


@demo(
    "q_join_skew_salted",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderkey % 20 = 5
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-skew-salted: the explicit salting operator (left side salted
    on a deterministic hash, right side replicated per salt bucket) must
    be row-for-row equal to the plain join — the oracle IS the plain
    join, so the driver's value hash proves semantics preservation, not
    just row count. The tool of last resort when one hot key holds a
    double-digit share of a 100 TB feed and AQE's split isn't enough."""
    from transit_efficiency_analysis_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 5)
        .withColumnRenamed("o_orderkey", "k")
    )
    return salted_join(
        li, o, key="k", salt_buckets=8, left_unique_col="l_partkey"
    ).select(
        F.col("k").alias("l_orderkey"), "l_linenumber", "l_quantity", "o_totalprice"
    )


@demo(
    "q_join_bloom_prefilter",
    sql="""
    SELECT l_returnflag,
           count(*) AS n_items,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join-bloom-prefilter: pure-expression Bloom runtime filter — build a
    one-row map<word,mask> bloom over the filtered dim keys (shuffle ≤
    m/64 rows regardless of dim size), broadcast it, and cull the fact
    table map-side BEFORE the exact join shuffles anything. Bloom FPs are
    removed by the exact join, so the oracle IS the plain join — the
    driver's value hash proves the pre-filter is transparent. At 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the matching sliver."""
    from transit_efficiency_analysis_spark.operators.bloomfilter import (
        bloom_prefilter,
        build_bloom,
    )

    from transit_efficiency_analysis_spark.operators.parallel import (
        ensure_min_parallelism,
    )

    # the per-row bloom probe (hash folds + map lookups) otherwise runs
    # inside the one-task scan stage of the single-row-group testdata
    # file (round 18, guide §2.5). No-op whenever splits ≥ cores, so the
    # cull-before-shuffle story is untouched at scale; measured at
    # sf0.1/local[32]: 3.57 → 1.54 s, identical aggregate.
    li = ensure_min_parallelism(load_table(spark, sf_dir, "lineitem"))
    keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # one tiny dim-side count sizes the filter (16 bits/key ≈ 0.5% FP);
    # the dim is the cheap side — same pattern as the IVF family's
    # statistics-derived centroid count
    from transit_efficiency_analysis_spark.operators.bloomfilter import sized_m_bits

    m_bits = sized_m_bits(keys.count())
    bloom = build_bloom(keys, "o_orderkey", m_bits=m_bits)
    candidates = bloom_prefilter(li, bloom, "l_orderkey", m_bits=m_bits)
    return (
        candidates.join(F.broadcast(keys), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


@demo(
    "q_join_nullsafe",
    sql="""
    WITH keyed AS (
        SELECT nullif(event_type, 'view') AS k, value FROM events
    ),
    dim AS (
        SELECT * FROM (VALUES ('click', 'interactive'), ('purchase', 'revenue'),
                              ('signup', 'growth'), ('error', 'reliability'),
                              (NULL, 'passive')) AS t(k, label)
    )
    SELECT d.label, count(*) AS n_events,
           CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE)
               AS sum_value
    FROM keyed e JOIN dim d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.label
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match NULL dim rows instead of silently dropping — the semantics a
    sentinel-encoded feed needs when "no category" is itself a category.
    Stays a broadcast HASH join (null-safe equality is still an equi-key
    to Spark), not the nested-loop a ``coalesce``-rewrite inequality
    would force."""
    from transit_efficiency_analysis_spark.functions.parity import parity_double

    e = load_table(spark, sf_dir, "events").select(
        F.nullif("event_type", F.lit("view")).alias("k"), "value"
    )
    dim = spark.createDataFrame(
        [
            ("click", "interactive"),
            ("purchase", "revenue"),
            ("signup", "growth"),
            ("error", "reliability"),
            (None, "passive"),
        ],
        "k string, label string",
    )
    return (
        e.join(F.broadcast(dim), e.k.eqNullSafe(dim.k))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            parity_double(F.sum(F.col("value").cast("decimal(18,6)")), 6).alias(
                "sum_value"
            ),
        )
    )


@demo(
    "q_join_incremental_maintenance",
    sql="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6))
                AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def q_join_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance: with batches ΔA, ΔB arriving on
    top of base tables A, B, the maintained view is updated as
    ``ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB`` — every maintenance term has a DELTA on at
    least one side, so the dominant cost is delta-sized, and the A⋈B
    history is NEVER re-joined (the join complement of
    ``q_agg_incremental_maintenance``'s monoid merge; at 100 TB this is
    the difference between an hourly tick costing an hour of data and
    costing five years of it). The demo splits both tables into
    base+delta by key hash, maintains the view through the three delta
    terms, and aggregates; the oracle is the full one-shot recompute —
    the driver hash proves the incremental algebra lossless."""
    from transit_efficiency_analysis_spark.functions.parity import parity_double

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    a, da = li.where(F.col("l_orderkey") % 10 != 3), li.where(
        F.col("l_orderkey") % 10 == 3
    )
    b, db = o.where(F.col("o_orderkey") % 7 != 2), o.where(
        F.col("o_orderkey") % 7 == 2
    )
    on = F.col("l_orderkey") == F.col("o_orderkey")
    view = a.join(b, on)  # the standing materialized view (A ⨝ B)
    maintained = (
        view.unionByName(da.join(b, on))
        .unionByName(a.join(db, on))
        .unionByName(da.join(db, on))
    )
    return maintained.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        parity_double(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 6
        ).alias("sum_price"),
    )
