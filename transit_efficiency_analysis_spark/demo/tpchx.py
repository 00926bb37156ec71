"""TPC-H battery completion: Q2 / Q8 / Q9 / Q11 / Q15 / Q16 / Q20 / Q21.

With these eight the engine covers all 22 TPC-H query shapes (Q1 in
``sqlsurface``, Q4/Q13 in ``graphextras``, the rest in ``tpch``), each
with an exact DuckDB twin.

Five of the eight need the PARTSUPP relation, which the driver's testdata
does not ship. Rather than skipping them, ``_partsupp`` derives a
deterministic partsupp from the tables that DO exist, using the public
dbgen supplier-assignment formula (TPC-H spec 4.2.3: supplier k of part p
is ``(p + k·(S/4 + (p-1+k)/S)) mod S``, adapted to the testdata's 0-based
keys) plus integer-hash availqty/supplycost columns. Every expression is
integer arithmetic on non-negative operands, so Spark's ``div``/``%`` and
DuckDB's ``//``/``%`` agree bit-for-bit and the oracle comparison stays
exact; supplycost is carried in CENTS (BIGINT) so no engine ever divides.

Money math follows the battery conventions (see ``demo.tpch``): sums run
wide, outputs narrow through ``functions.parity.parity_double``.
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

#: DuckDB CTE body for the derived partsupp (splice as ``WITH {_PS_CTE}, ...``).
_PS_CTE = """partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               ((ps_partkey * 7 + ps_suppkey * 13) % 9999) + 1 AS ps_availqty,
               ((ps_partkey * 31 + ps_suppkey * 17) % 100000) + 100 AS ps_supplycost_cents
        FROM (
            SELECT DISTINCT p_partkey AS ps_partkey,
                   (p_partkey + i * (s // 4 + (p_partkey + i) // s)) % s AS ps_suppkey
            FROM part
            CROSS JOIN (SELECT count(*) AS s FROM supplier)
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
        )
    )"""


def _revenue_col():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount")
    ).cast("decimal(4,2)")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: 4 suppliers per part via the dbgen assignment
    formula; availqty/supplycost from integer hashes of the key pair.
    All-integer, non-negative arithmetic — bit-identical across engines.
    ~4·|part| rows (8k at sf0.01): small enough to broadcast at test SFs,
    and derivable map-side from ``part`` at any scale (no shuffle)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_n = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s"))
    keyed = (
        p.crossJoin(F.broadcast(s_n))
        .select(
            "p_partkey",
            "s",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr("(p_partkey + i * (s div 4 + (p_partkey + i) div s)) % s").alias(
                "ps_suppkey"
            ),
        )
        # tiny supplier pools (sf0.001: S=10) can collide two of a part's
        # four assignments onto one supplier; the relation is keyed by
        # (part, supplier), so dedupe — duplicates are value-identical
        # (avail/cost are functions of the key), making this exact on
        # both engines
        .distinct()
    )
    return keyed.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 100000 + 100
        ).alias("ps_supplycost_cents"),
    )


@demo(
    "q_tpch_q2",
    sql=f"""
    WITH {_PS_CTE},
    eu_ps AS (
        SELECT ps_partkey, ps_supplycost_cents, s_acctbal, s_name, n_name
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost_cents
    FROM part
    JOIN eu_ps ON p_partkey = ps_partkey
    JOIN (SELECT ps_partkey AS min_pk, min(ps_supplycost_cents) AS min_cents
          FROM eu_ps GROUP BY ps_partkey) ON min_pk = p_partkey
    WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
      AND ps_supplycost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part within a region — the
    correlated MIN subquery decorrelated into a grouped join (per-part
    min over region suppliers, equi-joined back as the filter)."""
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_ps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_supplycost_cents", "s_acctbal", "s_name", "n_name")
    )
    per_part_min = eu_ps.groupBy(F.col("ps_partkey").alias("min_pk")).agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    return (
        F.broadcast(p)
        .join(eu_ps, p.p_partkey == eu_ps.ps_partkey)
        .join(F.broadcast(per_part_min), F.col("p_partkey") == F.col("min_pk"))
        .where(F.col("ps_supplycost_cents") == F.col("min_cents"))
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")
        )
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost_cents")
    )


@demo(
    "q_tpch_q8",
    sql=f"""
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                              ELSE CAST(0 AS DECIMAL(16,4)) END)
                     / sum(rev) AS DECIMAL(18,6)) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REVENUE} AS rev,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — one nation's slice of regional
    revenue for a part type, by order year. Ratio of two exact decimal
    sums through the q14 parity pattern."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", _revenue_col()).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            parity_double(F.sum(nation_rev) / F.sum(_revenue_col()), 6).alias(
                "mkt_share"
            )
        )
    )


@demo(
    "q_tpch_q9",
    sql=f"""
    WITH {_PS_CTE}
    SELECT n_name AS nation, o_year,
           CAST(CAST(sum(amount) AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REVENUE}
               - CAST(ps_supplycost_cents AS DECIMAL(12,0)) * CAST(0.01 AS DECIMAL(3,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%gear%'
    )
    GROUP BY n_name, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit (revenue minus supply cost) by
    supplier nation and year. The derived partsupp joins on BOTH keys, so
    only lineitems shipped by one of the part's assigned suppliers carry
    a cost — the same inner-join semantics as the spec query. Supplycost
    enters the decimal expression as cents × 0.01 (multiplication, never
    division — exact on both engines)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    cost = (
        F.col("ps_supplycost_cents").cast("decimal(12,0)")
        * F.lit(0.01).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(
            F.broadcast(ps),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(parity_double(F.sum(_revenue_col() - cost), 4).alias("sum_profit"))
    )


@demo(
    "q_tpch_q11",
    sql=f"""
    WITH {_PS_CTE},
    nat_ps AS (
        SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS value_cents
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(sum(value_cents) AS BIGINT) AS value_cents
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING CAST(sum(value_cents) AS BIGINT)
               * (SELECT count(DISTINCT ps_partkey) FROM nat_ps)
           > 2 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM nat_ps)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: important stock — parts whose one-nation inventory
    value exceeds a threshold scalar subquery over the same relation.
    The spec's fixed fraction scales with 1/SF (a constant cutoff empties
    at 10× the parts), so the threshold here is 2× the average per-part
    value — scale-invariant by construction. Carried entirely in integer
    cents: the HAVING comparison is ``sum·n_parts > 2·total`` with no
    floating point anywhere."""
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nat_ps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("value_cents"),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("value_cents")
    )
    total = nat_ps.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count_distinct("ps_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("ps_partkey", "value_cents")
    )


@demo(
    "q_tpch_q15",
    sql=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({_REVENUE}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_rev AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: top supplier — the revenue view over a quarter, kept as
    a wide exact decimal so the ``rev = max(rev)`` equality cannot be
    perturbed by rounding; the max is a broadcast scalar, not a second
    shuffle of the view."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue_col()).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            parity_double(F.col("total_rev"), 4).alias("total_revenue"),
        )
    )


@demo(
    "q_tpch_q16",
    sql=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 3, 7, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: parts/supplier relationship — distinct supplier counts
    per part attribute triple, excluding flagged suppliers (adapted: the
    spec's complaint-comment scan becomes a negative-balance filter; the
    NOT IN plans as a broadcast anti join)."""
    ps = _partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 3, 7, 14, 23, 36, 45, 49)
    )
    flagged = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            F.broadcast(flagged),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


@demo(
    "q_tpch_q20",
    sql=f"""
    WITH {_PS_CTE},
    shipped AS (
        SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          ON p_partkey = ps_partkey
        LEFT JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE CAST(2 * (ps_availqty % 60) AS DECIMAL(18,4))
              > coalesce(qty, CAST(0 AS DECIMAL(18,4)))
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN cand ON ps_suppkey = s_suppkey
    WHERE r_name = 'ASIA'
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: part-promotion candidates — suppliers of the named
    parts whose stock exceeds half of a year's shipments. The correlated
    quantity subquery is decorrelated into a grouped LEFT join (absent
    shipments count as zero). Stock is rescaled (``availqty % 60``) to
    the testdata's shipment volumes so the half-of-shipped predicate
    stays selective; the comparison itself is the spec's exact
    ``2·avail > qty`` decimal form."""
    ps = _partsupp(spark, sf_dir)
    named = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty")
    )
    cand = (
        ps.join(F.broadcast(named.select("p_partkey")), ps.ps_partkey == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
            "left",
        )
        .where(
            (2 * (F.col("ps_availqty") % 60)).cast("decimal(18,4)")
            > F.coalesce(F.col("qty"), F.lit(0).cast("decimal(18,4)"))
        )
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@demo(
    "q_tpch_q21",
    sql="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who kept orders waiting — the sole late
    supplier on a multi-supplier finalized order ("late" adapted to
    shipdate > orderdate + 60 days; the testdata has no commit/receipt
    dates). The oracle keeps the spec's correlated EXISTS/NOT-EXISTS
    form; the Spark plan decorrelates both into ONE aggregation per
    order (distinct suppliers, distinct late suppliers) — a qualifying
    lineitem is late with n_supp >= 2 and n_late = 1, provably the same
    predicate, with one shuffle instead of two correlated self-joins."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    tagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    per_order = tagged.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        tagged.where(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
