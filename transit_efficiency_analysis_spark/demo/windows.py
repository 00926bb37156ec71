"""Window-function demos (SURVEY.md §2.6 — the upsert kernel's substrate,
plus the running/rank/lag analytics surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_window_running",
    sql="""
    SELECT user_id, event_id, ts,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(18,6)) AS DOUBLE) AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS seq
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """running (prefix) aggregate per key in deterministic order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        parity_double(
            F.sum(F.col("value").cast("decimal(18,6)")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            6,
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@demo(
    "q_window_rank",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER w AS INTEGER) AS price_rank,
           CAST(dense_rank() OVER w AS INTEGER) AS price_dense_rank,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank family per key (largest orders per customer)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@demo(
    "q_window_lag",
    sql="""
    SELECT user_id, event_id, ts,
           (epoch(ts) - epoch(lag(ts) OVER w)) / 60 AS minutes_since_prev,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: inter-event gaps per key in minutes."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")) / 60.0
    return e.select(
        "user_id",
        "event_id",
        "ts",
        gap.alias("minutes_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@demo(
    "q_window_pctrank",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey)
               OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank-statistics window family: percent_rank / cume_dist (exact
    rational doubles — identical on both engines) + first/last value over
    an unbounded frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
    )


@demo(
    "q_window_ntile",
    sql="""
    SELECT decile, count(*) AS n_orders,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    GROUP BY decile
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """equi-depth binning via ntile(10) — the feature-bucketing shape
    (both engines implement the SQL-standard ceil-division tile split,
    and the o_orderkey tie-break makes bin membership total-ordered and
    deterministic). The unpartitioned window is the honest cost of a
    GLOBAL equi-depth split; at 100 TB the same contract is served by
    `q_clean_winsorize`-style rank arithmetic per partition key or the
    approx-quantile cutpoints — this demo pins the exact semantics those
    approximations are judged against."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        # DuckDB's ntile returns BIGINT; match it (the driver hash is
        # dtype-sensitive — the q_text_pack lesson)
        o.select("o_totalprice", F.ntile(10).over(w).cast("long").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
