"""Round-7 additions: plan shapes and API-level behavior the oracles
can't see — lateral decorrelation, SQL-UDF inlining, pipe-syntax plan
equivalence, recursive-CTE safety rails, and the Python DataSource's
partition striping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.plans import (
    assert_no_python_row_udf,
    physical_plan,
)


def test_lateral_topk_is_decorrelated(spark, sf_dir):
    """The LATERAL subquery must compile to a join + per-group limit,
    not a per-outer-row re-execution: no nested-loop-per-row artifacts,
    and the inner ORDER BY/LIMIT becomes a bounded-window/group-limit
    shape over the correlation key."""
    df = load_registry()["q_join_lateral_topk"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" in plan, "lateral must decorrelate into a join"
    # Catalyst rewrites ORDER BY+LIMIT per group into a rank-filter
    # window (WindowGroupLimit pushes the heap to the map side)
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert_no_python_row_udf(df)


def test_sql_udf_is_inlined(spark, sf_dir):
    """CREATE FUNCTION ... RETURN <expr> must inline: the physical plan
    contains the CASE arithmetic, not a black-box UDF invocation."""
    df = load_registry()["q_sql_udf"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CASE WHEN" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipe_syntax_plan_equals_ansi_plan(spark, sf_dir):
    """|> stages are syntax only: the pipe form and the ANSI form of the
    same query must produce the same result (Catalyst plans converge to
    the same aggregate; values compared exactly here)."""
    from transit_efficiency_analysis_spark.sources.registry import load_table

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    pipe = load_registry()["q_sql_pipe_q1"].fn(spark, sf_dir)
    ansi = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    assert sorted(pipe.collect(), key=key) == sorted(ansi.collect(), key=key)


def test_recursive_chain_covers_every_order(spark, sf_dir):
    """The walk must visit each order exactly once (positions are a
    permutation of 1..chain_len per customer) and the final cumulative
    spend must equal the per-customer total."""
    from transit_efficiency_analysis_spark.sources.registry import load_table

    df = load_registry()["q_sql_recursive_chain"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    assert df.count() == orders.count()
    # per customer: max(pos) == count, and positions are distinct
    bad = (
        df.groupBy("cust")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("pos").alias("mx"),
            F.countDistinct("pos").alias("nd"),
        )
        .where((F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n")))
        .count()
    )
    assert bad == 0
    # chain-final cumulative spend equals the straight per-customer sum
    final = df.groupBy("cust").agg(F.max_by("cum_spend", "pos").alias("walked"))
    want = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("summed")
    )
    mism = (
        final.join(want, "cust")
        .where(F.abs(F.col("walked") - F.col("summed")) > 1e-9)
        .count()
    )
    assert mism == 0


def test_recursion_level_limit_guard(spark):
    """The engine fails loudly when a recursion exceeds the level limit
    (no silent truncation of an unfinished walk)."""
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "5")
    try:
        with pytest.raises(Exception, match="RECURSION_LEVEL_LIMIT|level limit"):
            spark.sql(
                """
                WITH RECURSIVE t(n) AS (
                    SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100
                ) SELECT count(*) AS c FROM t
                """
            ).collect()
    finally:
        spark.conf.unset("spark.sql.cteRecursionLevelLimit")


def test_python_datasource_stripes_partitions(spark):
    """partitions() controls scan parallelism: 8 requested partitions →
    8 scan partitions; rows are disjoint and complete across stripes."""
    from transit_efficiency_analysis_spark.sources.python_datasource import (
        VehiclePingsDataSource,
        ping_row,
    )

    spark.dataSource.register(VehiclePingsDataSource)
    df = (
        spark.read.format("vehicle_pings")
        .option("n_vehicles", "16")
        .option("n_polls", "10")
        .option("n_partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(ping_row(v, p) for v in range(16) for p in range(10))
    assert got == want


def test_lm_score_is_windowless_bounded_shuffles(spark, sf_dir):
    """Bigram extraction must be a map-side array fold: no Window, no
    self-join; the only exchanges are the two count aggregations and
    the per-doc score aggregation (broadcast joins add none)."""
    from transit_efficiency_analysis_spark.plans import count_shuffles

    df = load_registry()["q_text_lm_score"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" not in plan, "bigrams must not use a lag window"
    assert count_shuffles(df) <= 3
    assert "BroadcastHashJoin" in plan, "count tables must broadcast back"
    assert_no_python_row_udf(df)


def test_sql_table_udf_inlines_to_grouped_join(spark, sf_dir):
    """The LATERAL table-function invocation must inline: aggregation
    over the correlation key, no Python, no per-row nested execution."""
    df = load_registry()["q_sql_table_udf"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rerank_candidates_prune_before_vector_math(spark, sf_dir):
    """Stage 2 must score only stage-1 candidates: the embedding table
    is semi-joined down before the cosine join (broadcast semi-join in
    plan), and the final cut is a bounded-window rank filter."""
    df = load_registry()["q_retrieval_rerank"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, "candidate semi-join must prune the vectors"
    rows = df.collect()
    assert len(rows) == 10 and all(r["rank"] <= 10 for r in rows)


def test_arrow_udf_counts_multibyte_correctly(spark):
    """n_chars counts code points, n_bytes counts UTF-8 bytes — pinned
    on a string where they differ."""
    from transit_efficiency_analysis_spark.demo.pandasudf import (
        q_arrow_udf_scalar,  # noqa: F401  (registration side effect)
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pa.array(["héllo", "日本語", "ascii"])
    chars = pc.utf8_length(s).to_pylist()
    nbytes = pc.binary_length(pc.cast(s, pa.binary())).to_pylist()
    assert chars == [5, 3, 5]
    assert nbytes == [6, 9, 5]
