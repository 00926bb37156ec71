"""SQL-surface demos: subqueries, grouping sets, arrays, and the SQL API.

The engine accepts Spark SQL directly (same Catalyst plans as the
DataFrame API) — several demos here run through ``spark.sql`` over temp
views to prove that surface. Average-comparisons are expressed as
``value * n > decimal_total`` (algebraically identical to ``value > avg``)
so the predicate is exact on both engines.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_grouping_sets",
    sql="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explicit GROUPING SETS via the SQL API (finer control than
    cube/rollup). The wide decimal total narrows through
    ``parity_double`` in the outer projection (overflow-guarded)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    wide = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS total_wide
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
    return wide.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        parity_double(F.col("total_wide"), 4).alias("total"),
    )


@demo(
    "q_sql_tpch_q1",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
               * CAST(1 + l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through the SQL API — the canonical pricing-summary
    aggregation with exact decimal totals. Sums stay wide inside the SQL;
    the outer projection narrows via ``parity_double`` (overflow-guarded:
    sum_base_price crosses DECIMAL(18,4)'s 1e14 bound around SF ~400)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    wide = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS DECIMAL(18,4))) AS w_qty,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS w_base_price,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS w_disc_price,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
                   * CAST(1 + l_tax AS DECIMAL(4,2))) AS w_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    return wide.select(
        "l_returnflag",
        "l_linestatus",
        parity_double(F.col("w_qty"), 4).alias("sum_qty"),
        parity_double(F.col("w_base_price"), 4).alias("sum_base_price"),
        parity_double(F.col("w_disc_price"), 4).alias("sum_disc_price"),
        parity_double(F.col("w_charge"), 6).alias("sum_charge"),
        "count_order",
    )


@demo(
    "q_array_agg",
    sql="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_ids_csv,
           CAST(len(list(DISTINCT user_id)) AS INTEGER) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array aggregation: per-group sorted distinct collection (sorted so
    the multiset is deterministic regardless of accumulation order).

    The collected array is projected to a CSV string: the driver's
    canonicalizer hashes scalar columns only (array cells raise
    ``unhashable type: 'list'`` in pandas ``sort_values``), so the demo
    keeps the ``collect_set``/``array_sort`` plan but emits an
    ``array_join`` of it. Numeric sort happens BEFORE the string cast on
    both engines, so element order agrees.
    """
    e = load_table(spark, sf_dir, "events")
    ids = F.array_sort(F.collect_set("user_id"))
    return e.groupBy("event_type").agg(
        F.array_join(F.transform(ids, lambda x: x.cast("string")), ",").alias(
            "user_ids_csv"
        ),
        F.size(F.collect_set("user_id")).alias("n_users"),
    )


@demo(
    "q_array_explode",
    sql="""
    SELECT event_type, unnest(ids) AS user_id
    FROM (SELECT event_type, list_sort(list(DISTINCT user_id)) AS ids
          FROM events GROUP BY event_type)
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode: array column back to rows (the UDTF shape used by the
    realtime feed decode)."""
    e = load_table(spark, sf_dir, "events")
    grouped = e.groupBy("event_type").agg(
        F.array_sort(F.collect_set("user_id")).alias("ids")
    )
    return grouped.select("event_type", F.explode("ids").alias("user_id"))


@demo(
    "q_agg_listagg",
    sql="""
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS action_seq,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — ``listagg(...) WITHIN GROUP (ORDER
    BY ...)`` (standard-SQL ordered concat, new in Spark 4): each
    user's event types joined into one ``>``-separated action sequence,
    ordered by (ts, event_id) so the string is deterministic (event_id
    breaks timestamp ties). This is the training-sequence construction
    shape — per-entity ordered histories flattened into single
    sequence-model examples — expressed as ONE aggregate instead of a
    collect_list + sort_array + array_join chain. One shuffle on the
    group key with per-group payload bounded by events-per-user;
    DuckDB's ``string_agg (ORDER BY ...)`` is the oracle twin."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id,
               listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id)
                   AS action_seq,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
        """
    )


@demo(
    "q_sql_pipe_q1",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sql_pipe_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's ``|>`` operators — queries written as
    a linear dataflow, each stage an explicit operator, instead of the
    inside-out SELECT nesting): the TPC-H Q1 pricing summary as
    ``FROM |> WHERE |> EXTEND |> AGGREGATE``. Pipe stages compile to
    the IDENTICAL Catalyst plan as the ANSI form (the oracle is that
    ANSI form), so this pins both the dialect surface and
    plan-equivalence. Decimal sums narrow through the same parity casts
    as q_sql_tpch_q1."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND CAST(l_extendedprice AS DECIMAL(18,4)) AS price_wide
        |> AGGREGATE
             CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(price_wide) AS DECIMAL(18,4)) AS DOUBLE)
                 AS sum_base_price,
             count(*) AS count_order
           GROUP BY l_returnflag, l_linestatus
        """
    )


@demo(
    "q_sql_udf",
    sql="""
    SELECT CASE WHEN value < 0 THEN 'neg'
                WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (``CREATE FUNCTION ... RETURN expr``,
    Spark 4): the banding logic is declared ONCE as a catalog function
    and reused by name — the governed-semantics pattern (metric
    definitions shared across queries) without shipping any Python.
    Catalyst INLINES the function body at analysis time, so the plan is
    identical to writing the CASE inline (no black-box call, full
    codegen/pushdown) — which is exactly what the oracle proves, since
    it IS the inlined form."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION value_band(v DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN v < 0 THEN 'neg'
                    WHEN v < 50 THEN 'low'
                    WHEN v < 200 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        """
        SELECT value_band(value) AS band,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY value_band(value)
        """
    )


@demo(
    "q_sql_unpivot",
    sql="""
    WITH agg AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n_events,
               CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                    AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
    )
    SELECT event_type, 'n_events' AS metric, n_events AS val FROM agg
    UNION ALL
    SELECT event_type, 'n_users', n_users FROM agg
    UNION ALL
    SELECT event_type, 'sum_value', sum_value FROM agg
    """,
)
def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``UNPIVOT`` (wide metrics → long (metric, value) rows — the
    relational complement of q_agg_pivot, and the shape metric stores
    and BI melt operations want). The unpivot is a zero-shuffle
    Expand over the already-aggregated 5-row table; the oracle states
    the same relation as explicit UNION ALL branches, so the demo pins
    Spark's UNPIVOT null/typing semantics (values unified to DOUBLE)
    against first principles."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, metric, val FROM (
            SELECT event_type,
                   CAST(count(*) AS DOUBLE) AS n_events,
                   CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
                        AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type
        ) UNPIVOT (val FOR metric IN (n_events, n_users, sum_value))
        """
    )


@demo(
    "q_sql_parameterized",
    sql="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS DOUBLE) AS total
    FROM lineitem
    WHERE l_quantity >= 30 AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers — ``:name`` bound via
    ``spark.sql(query, args=...)``): the injection-safe way to template
    queries, binding VALUES not SQL text (a quoted string in an arg can
    never alter the statement). The markers bind as literals at
    analysis time, so constant folding and predicate pushdown see them
    exactly like inline constants — the oracle is the inlined form."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS DOUBLE) AS total
        FROM lineitem
        WHERE l_quantity >= :min_qty AND l_shipdate < :cutoff
        GROUP BY l_returnflag
        """,
        args={"min_qty": 30, "cutoff": datetime.date(1998, 1, 1)},
    )


@demo(
    "q_sql_table_udf",
    sql="""
    SELECT user_id, event_type, count(*) AS n
    FROM events
    WHERE user_id % 29 = 0
    GROUP BY user_id, event_type
    """,
)
def q_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (``CREATE FUNCTION ... RETURNS TABLE``,
    Spark 4): a parameterized view — the per-entity history shape every
    metrics layer wants — declared once and invoked CORRELATED via
    ``LATERAL user_hist(u.user_id)``, one logical invocation per outer
    row. Catalyst inlines the function body and decorrelates the
    lateral, so the plan is the plain grouped join the oracle states —
    no per-row re-execution (the probe result worth keeping: table
    functions reject non-foldable args in FROM position, but LATERAL
    correlation is exactly how you parameterize them per row)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION user_hist(uid BIGINT)
        RETURNS TABLE(event_type STRING, n BIGINT)
        RETURN SELECT event_type, count(*) AS n
               FROM events WHERE user_id = uid GROUP BY event_type
        """
    )
    return spark.sql(
        """
        SELECT u.user_id, h.event_type, h.n
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 0) u,
        LATERAL user_hist(u.user_id) h
        """
    )


@demo(
    "q_sql_collation",
    sql="""
    SELECT lang,
           count(DISTINCT w) AS n_exact,
           count(DISTINCT lower(w)) AS n_ci,
           count(*) AS n_tokens
    FROM (SELECT lang, unnest(string_split(upper_variant, ' ')) AS w
          FROM (SELECT lang,
                       CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END
                           AS upper_variant
                FROM documents))
    WHERE w <> ''
    GROUP BY lang
    """,
)
def q_sql_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4): ``collate(w, 'UTF8_LCASE')`` makes
    case-insensitivity a property of the VALUE — comparisons, DISTINCT,
    and GROUP BY all follow it, instead of sprinkling ``lower()`` at
    every call site. The demo makes half the corpus uppercase so the
    exact/case-insensitive distinct counts genuinely diverge, then
    counts both per language; the oracle states the ``lower()``
    formulation the collation replaces (equivalent on this corpus —
    ASCII + caseless CJK; locale edge cases like the Turkish dotless i
    are exactly why the collation form is the principled one)."""
    d = load_table(spark, sf_dir, "documents")
    variant = F.when(F.col("doc_id") % 2 == 0, F.upper("text")).otherwise(
        F.col("text")
    )
    toks = (
        d.select("lang", F.explode(F.split(variant, " ")).alias("w"))
        .where(F.col("w") != "")
    )
    return toks.groupBy("lang").agg(
        F.countDistinct("w").alias("n_exact"),
        F.countDistinct(F.expr("collate(w, 'UTF8_LCASE')")).alias("n_ci"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


@demo(
    "q_sql_session_variables",
    sql="""
    SELECT l_returnflag, count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS DOUBLE) AS total
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def q_sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 ``DECLARE VARIABLE`` / ``SET
    VAR``): the stateful cousin of parameter markers — a variable is
    declared once per session and referenced by name inside any later
    statement, binding as a literal at analysis time (constant folding
    and pushdown see it exactly like an inline constant; the oracle is
    the inlined form). ``DECLARE OR REPLACE`` keeps the demo idempotent
    across invocations in one session."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE min_qty INT DEFAULT 0")
    spark.sql("SET VAR min_qty = 30")
    return spark.sql(
        """
        SELECT l_returnflag, count(*) AS n,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS DOUBLE) AS total
        FROM lineitem
        WHERE l_quantity >= min_qty
        GROUP BY l_returnflag
        """
    )


@demo(
    "q_sql_group_by_all",
    sql="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                AS DECIMAL(18,4)) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus, n, total
    """,
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (Spark 4; DuckDB-originated
    shorthand): every non-aggregate select item becomes a grouping key,
    every output column an order key — the analyzer rewrite produces
    the IDENTICAL plan as the explicit form (which is the oracle), so
    the shorthand costs nothing at any scale."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS DOUBLE) AS total
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@demo(
    "q_sql_star_except_lateral",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate, o_orderpriority,
           o_custkey * 10 + (o_orderkey % 10) AS route_code,
           route_code % 7 AS shard
    FROM orders
    """,
)
def q_sql_star_except_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` star pruning + LATERAL COLUMN ALIAS
    (Spark 4 surface): drop the payload column at the star instead of
    enumerating survivors, then reference a just-defined select item
    (``route_code``) from a later item in the same list — the analyzer
    inlines the alias, so the plan is identical to writing the
    expression twice (the oracle's explicit form). The EXCEPT prunes
    o_totalprice at the scan (column pruning still applies)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT * EXCEPT (o_totalprice),
               o_custkey * 10 + (o_orderkey % 10) AS route_code,
               route_code % 7 AS shard
        FROM orders
        """
    )
