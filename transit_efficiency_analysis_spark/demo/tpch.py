"""TPC-H-shaped query battery (Q3 / Q5 / Q6 over the testdata star schema).

Classic decision-support shapes a reference user would expect to run:
join + aggregate + top-k, multi-way join with region filter, and the
predicate-heavy scan aggregate. Exact decimal money math throughout.

SCALE VALIDITY of the ``CAST(sum(...) AS DECIMAL(18,x)) AS DOUBLE`` parity
hop (here and in analytics/sqlsurface/windows/windowed/semistructured/
joins): the *sum itself* runs at wide precision (Spark widens to p+10,
DuckDB to 38) — only the finished total passes through DECIMAL(18,x),
which holds 18-x integral digits. The narrow hop exists because
DuckDB's decimal→double conversion is correctly rounded only for
int64-backed decimals (p<=18) — a hugeint decimal double-rounds and
breaks bit-parity. Totals beyond 18-x integral digits (TPC-H Q1
sum_base_price crosses 1e14 around SF ~400) FAIL LOUDLY on both engines:
every narrowing here routes through ``functions.parity.parity_double``,
which raises on overflow even under non-ANSI casting (DuckDB's own cast
errors on overflow). Production queries at 100 TB should emit the wide
decimal directly; the (18,x)→DOUBLE hop is the oracle-parity form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
)


def _revenue_col():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")


@demo(
    "q_tpch_q3",
    sql=f"""
    SELECT l_orderkey,
           CAST(CAST(sum({_REVENUE}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: shipping-priority top-10 by revenue."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(parity_double(F.sum(_revenue_col()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@demo(
    "q_tpch_q5",
    sql=f"""
    SELECT n_name,
           CAST(CAST(sum({_REVENUE}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: local-supplier revenue by nation within a region."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(parity_double(F.sum(_revenue_col()), 4).alias("revenue"))
    )


@demo(
    "q_tpch_q6",
    sql=f"""
    SELECT CAST(CAST(sum({_REVENUE.replace('1 - l_discount', 'l_discount')}) AS DECIMAL(18,4))
               AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: predicate-heavy forecast-revenue scan aggregate (all four
    predicates push to the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            parity_double(F.sum(rev), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@demo(
    "q_tpch_q10",
    sql=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(sum({_REVENUE}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 returned-item revenue by customer (join + agg +
    global top-k; the limit plans as TakeOrdered, not a full sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(parity_double(F.sum(_revenue_col()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@demo(
    "q_tpch_q12",
    sql="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: late-shipment priority counts by line status (the
    testdata schema has no receipt/commit dates or ship modes, so the
    late predicate is shipdate > orderdate and the slice key is
    l_linestatus — same conditional-aggregation plan shape; range
    predicates push to the lineitem scan)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@demo(
    "q_tpch_q14",
    sql=f"""
    SELECT CAST(CAST(
               100.00 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REVENUE}
                                 ELSE CAST(0 AS DECIMAL(16,4)) END)
               / sum({_REVENUE}) AS DECIMAL(18,6)) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — ratio of two exact decimal sums,
    emitted through DECIMAL(18,6) -> DOUBLE on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").like("PROMO%"), _revenue_col()
    ).otherwise(F.lit(0).cast("decimal(16,4)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            parity_double(
                F.lit(100.00) * F.sum(promo) / F.sum(_revenue_col()), 6
            ).alias("promo_revenue")
        )
    )
