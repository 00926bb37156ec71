"""TPC-H completion battery: derived-partsupp properties and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo.tpchx import _partsupp
from transit_efficiency_analysis_spark.plans import physical_plan


def test_derived_partsupp_shape(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    rows = ps.collect()
    n_parts = ps.select("ps_partkey").distinct().count()
    # 4 suppliers per part, (part, supplier) pairs distinct, keys in range
    assert len(rows) <= 4 * n_parts  # dupes from tiny supplier pools dedupe
    assert len({(r["ps_partkey"], r["ps_suppkey"]) for r in rows}) == len(rows)
    n_supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert all(0 <= r["ps_suppkey"] < n_supp for r in rows)
    assert all(1 <= r["ps_availqty"] <= 9999 for r in rows)
    assert all(100 <= r["ps_supplycost_cents"] < 100100 for r in rows)


def test_derived_partsupp_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, _partsupp(spark, sf_dir).collect()))
    b = sorted(map(tuple, _partsupp(spark, sf_dir).collect()))
    assert a == b


def test_tpchx_plans_have_no_cartesian(spark, sf_dir):
    """The eight completion queries must never plan a CartesianProduct;
    BroadcastNestedLoopJoin may appear ONLY as the 1-row scalar-subquery
    append (its build side is a single-row aggregate)."""
    from transit_efficiency_analysis_spark.demo import load_registry

    reg = load_registry()
    for name in [
        "q_tpch_q2", "q_tpch_q8", "q_tpch_q9", "q_tpch_q11",
        "q_tpch_q15", "q_tpch_q16", "q_tpch_q20", "q_tpch_q21",
    ]:
        plan = physical_plan(reg[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_q21_aggregate_form_matches_exists_form(spark, sf_dir):
    """The decorrelated one-aggregation Q21 equals a literal
    EXISTS/NOT-EXISTS translation (two extra self-joins) row for row."""
    from transit_efficiency_analysis_spark.demo.tpchx import q_tpch_q21
    from transit_efficiency_analysis_spark.sources.registry import load_table

    got = sorted(map(tuple, q_tpch_q21(spark, sf_dir).collect()))

    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    ).distinct()
    l1 = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            late.select(
                F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
            ).distinct(),
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    want = sorted(
        map(
            tuple,
            l1.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), F.col("s_name"))
            .limit(100)
            .collect(),
        )
    )
    assert got == want
