"""Set-operation / distinct / top-k demos (SURVEY.md §2.6 — capabilities the
engine provides beyond the reference's fixed dataflows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_set_union",
    sql="""
    SELECT key_id, src FROM (
        SELECT DISTINCT o_custkey AS key_id, 'orders' AS src FROM orders
        UNION ALL
        SELECT DISTINCT user_id AS key_id, 'events' AS src FROM events
    )
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union-all of two deduplicated projections with provenance tags."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    a = o.select(F.col("o_custkey").alias("key_id")).distinct().withColumn("src", F.lit("orders"))
    b = e.select(F.col("user_id").alias("key_id")).distinct().withColumn("src", F.lit("events"))
    return a.unionByName(b)


@demo(
    "q_set_intersect",
    sql="""
    SELECT o_custkey AS key_id FROM orders
    INTERSECT
    SELECT user_id AS key_id FROM events
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (distinct semantics on both engines)."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key_id"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("key_id"))
    return o.intersect(e)


@demo(
    "q_set_except",
    sql="""
    SELECT c_custkey AS key_id FROM customer
    EXCEPT
    SELECT o_custkey AS key_id FROM orders WHERE o_totalprice > 200000
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """except/minus (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key_id"))
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("key_id"))
    )
    return c.subtract(o)


@demo(
    "q_distinct_agg",
    sql="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_days
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct aggregates (multiple per group)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
    )


@demo(
    "q_limit_topk",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort + limit → TakeOrderedAndProject (no global sort materialized);
    deterministic via the unique-key tiebreaker."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@demo(
    "q_topk_per_group",
    sql="""
    SELECT source, lang, doc_id, n_chars, rk
    FROM (
        SELECT source, lang, doc_id, n_chars,
               CAST(row_number() OVER (PARTITION BY source, lang
                                       ORDER BY n_chars DESC, doc_id ASC)
                    AS INTEGER) AS rk
        FROM documents
    )
    WHERE rk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-k PER GROUP (the corpus-curation shape: keep the 3 longest
    documents of every (source, lang) slice) via rank-then-filter: one
    shuffle on the group key, a per-partition window, and a filter that
    Spark pushes into the window operator as a Partial+Final
    ``WindowGroupLimit`` (plan-audited): each MAP-side partition keeps at
    most k rows per group BEFORE the shuffle, so shuffle volume is
    bounded by #groups x k x #map-partitions, not the table. Unlike the global ``q_limit_topk`` there is no
    single TakeOrdered bottleneck; output is #groups x k rows.
    Deterministic via the unique doc_id tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        d.select("source", "lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


_REF_TOKENS = "('table', 'join', 'query', 'spark', 'zebra')"


@demo(
    "q_array_setops",
    sql=f"""
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(w, x -> x IN {_REF_TOKENS}))), ','), '')
               AS overlap_csv,
           CAST(len(list_distinct(list_filter(w, x -> x NOT IN {_REF_TOKENS})))
                AS INTEGER) AS n_only_doc,
           len(list_filter(w, x -> x IN {_REF_TOKENS})) > 0 AS overlaps
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
                 AS w
          FROM documents)
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operations surface — ``array_intersect`` /
    ``array_except`` / ``arrays_overlap`` against a reference
    vocabulary (the tag-matching / keyword-screen shape): per document,
    the sorted intersection with the reference set, the count of
    distinct tokens OUTSIDE it, and the overlap flag. Spark's array
    set-ops dedup their result (set semantics), mirrored in the oracle
    with ``list_distinct``; the sorted CSV projection makes the
    intersection order-insensitive for the hash. Pure scan-fused
    expressions against a literal array — no join, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ref = F.array(*[F.lit(t) for t in
                    ("table", "join", "query", "spark", "zebra")])
    w = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_intersect(w, ref)), ","
        ).alias("overlap_csv"),
        F.size(F.array_except(w, ref)).alias("n_only_doc"),
        F.arrays_overlap(w, ref).alias("overlaps"),
    )
