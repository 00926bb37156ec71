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


@demo(
    "q_tpch_q7",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum({_REVENUE}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: volume shipping between two nations by year — the
    bidirectional nation-pair predicate forces the disjunctive join
    filter AFTER both nation joins (both tiny: broadcast)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        F.broadcast(s)
        .join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(parity_double(F.sum(_revenue_col()), 4).alias("revenue"))
    )


@demo(
    "q_tpch_q17",
    sql="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE)
               / 7.0 AS avg_yearly,
           count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_pk,
                 count(*) AS cnt,
                 sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_total
          FROM lineitem GROUP BY l_partkey) ON agg_pk = l_partkey
    WHERE p_brand = 'Brand#12'
      AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * cnt < qty_total
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: small-quantity-order revenue — the per-part correlated
    average decorrelated into a grouped join; the avg comparison is the
    exact algebraic form qty·5·n < Σqty (qty < 0.2·avg) so no float
    rounding can flip a row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty_total"),
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        per_part, F.col("l_partkey") == F.col("agg_pk")
    )
    small = j.where(
        F.col("l_quantity").cast("decimal(18,4)") * 5 * F.col("cnt") < F.col("qty_total")
    )
    return small.agg(
        (parity_double(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 4) / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@demo(
    "q_tpch_q18",
    sql="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-volume customers — GROUP/HAVING subquery as a
    semi-join filter, then the top-100 by order value (TakeOrdered, not a
    full sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"),
              F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"), "o_totalprice",
        )
        .agg(parity_double(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 4).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@demo(
    "q_tpch_q19",
    sql=f"""
    SELECT CAST(CAST(sum({_REVENUE}) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: discounted revenue under three disjunctive brand/size/
    quantity branches — the OR-of-ANDs predicate that exercises join
    filter pushdown (part side prunes on brand+size before the join)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(branch)
        .agg(
            parity_double(F.sum(_revenue_col()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@demo(
    "q_tpch_q22",
    sql="""
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (adapted: nationkey as country code, 'no urgent orders'
    as the inactivity predicate since every sf0.01 customer has orders):
    global-average scalar subquery in exact algebraic form (bal·n > Σbal)
    + anti join + grouped balance totals."""
    c = load_table(spark, sf_dir, "customer")
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("npos"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total_pos"),
    )
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast("decimal(18,2)") * F.col("npos") > F.col("total_pos"))
    )
    inactive = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return inactive.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        parity_double(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).alias("totacctbal"),
    )
