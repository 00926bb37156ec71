"""Semi-structured (JSON) and range-frame window demos.

JSON props parse to typed structs (the nested-feed pattern in miniature);
the range window computes trailing time-interval aggregates — the
timeseries frame the reference's dashboard would need for rolling delay
averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.parity import parity_double
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_json_parse",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events
    """,
)
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing: ``from_json`` to a typed struct, field access, absent
    fields → NULL (the nested-document pattern of the realtime feed)."""
    e = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType(), True)])
    parsed = F.from_json("props", schema)
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        (parsed.getField("k") % 7).alias("k_mod"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@demo(
    "q_window_range",
    sql="""
    SELECT user_id, event_id, ts,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY epoch(ts)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DECIMAL(18,6)) AS DOUBLE) AS trailing_1h_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
               AS trailing_1h_events
    FROM events
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range-frame window: trailing 1-hour per-key aggregates ordered by
    event time (RANGE frames bound by value, not row count — ties at the
    same timestamp all enter the frame together, so the result is
    deterministic without a tiebreaker)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        parity_double(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 6)
        .alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@demo(
    "q_semi_variant",
    sql="""
    SELECT o_orderkey,
           o_orderkey AS vid,
           o_orderpriority AS priority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total,
           o_orderkey % 7 AS tag1,
           TRUE AS missing_is_null
    FROM orders
    """,
)
def q_semi_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4's open-schema semi-structured type): each order
    renders to a JSON document (nested object + array), ``parse_json``
    ingests it as VARIANT — the binary-encoded store-first-ask-later
    column Spark shreds lazily instead of forcing a schema at write
    time — and ``variant_get`` extracts typed values by JSON path
    (nested field, array index, decimal re-cast). ``try_variant_get``
    on an absent path yields NULL instead of erroring. The oracle reads
    the original columns, so the driver hash proves render → VARIANT →
    typed-extract is lossless (the q_semi_xml_parse pattern, for the
    type that replaces string-JSON props at scale: one parse at ingest,
    pruned binary access per query instead of per-query re-parsing).
    All map-side expressions — render, parse, and every extraction fuse
    into the scan projection; zero shuffles."""
    o = load_table(spark, sf_dir, "orders")
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_custkey").alias("cid"),
                F.col("o_orderpriority").alias("pr"),
            ).alias("cust"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
            F.array(
                F.col("o_orderkey") % 5, F.col("o_orderkey") % 7
            ).alias("tags"),
        )
    )
    v = F.parse_json(doc).alias("v")
    return o.select("o_orderkey", v).select(
        "o_orderkey",
        F.variant_get(F.col("v"), "$.id", "bigint").alias("vid"),
        F.variant_get(F.col("v"), "$.cust.pr", "string").alias("priority"),
        F.variant_get(F.col("v"), "$.total", "decimal(18,2)")
        .cast("double")
        .alias("total"),
        F.variant_get(F.col("v"), "$.tags[1]", "bigint").alias("tag1"),
        F.try_variant_get(F.col("v"), "$.cust.nope", "bigint")
        .isNull()
        .alias("missing_is_null"),
    )


@demo(
    "q_semi_xml_parse",
    sql="""
    SELECT o_orderkey,
           o_custkey AS cust,
           o_orderpriority AS priority,
           o_totalprice AS total,
           TRUE AS missing_is_null
    FROM orders
    """,
)
def q_semi_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML parsing (``from_xml``, built into Spark 4 — the
    spark-xml package merged upstream): each order is rendered as an XML
    fragment with an ATTRIBUTE id (``_o`` rebinding) and nested child
    elements, parsed back through a typed schema, fields extracted and
    cast. The oracle reads the original columns directly, so the driver
    hash proves render → parse is lossless; an absent element surfaces
    as NULL (``missing_is_null``). Safe-by-construction input: attribute
    and element payloads here are numerics and the enum-like priority
    strings (``1-URGENT`` …) — no XML metacharacters, so concat-rendering
    needs no escaping (the file-sink demo covers writer-side escaping
    for arbitrary text). Pure map-side expressions: render, parse, and
    extract all fuse into the scan projection — zero shuffles."""
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit('<order o="'),
        F.col("o_orderkey"),
        F.lit('"><cust>'),
        F.col("o_custkey"),
        F.lit("</cust><priority>"),
        F.col("o_orderpriority"),
        F.lit("</priority><total>"),
        F.format_number(F.col("o_totalprice").cast("decimal(18,2)"), 2),
        F.lit("</total></order>"),
    )
    schema = (
        "_o BIGINT, cust BIGINT, priority STRING, total STRING, nope STRING"
    )
    p = F.from_xml(xml, schema).alias("p")
    return o.select("o_orderkey", p).select(
        "o_orderkey",
        F.col("p._o").alias("oid"),
        F.col("p.cust").alias("cust"),
        F.col("p.priority").alias("priority"),
        F.regexp_replace("p.total", ",", "").cast("double").alias("total"),
        F.col("p.nope").isNull().alias("missing_is_null"),
    ).where(
        F.col("oid") == F.col("o_orderkey")  # attribute round-trip check
    ).drop("oid")


@demo(
    "q_semi_map_ops",
    sql="""
    SELECT event_id,
           CAST(2 AS INTEGER) AS m_size,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7
                AS STRING) AS k_val,
           CAST(user_id % 10 AS STRING) AS u_val,
           'k,u' AS keys_csv,
           user_id % 10 = 3 AS has_u3
    FROM events
    """,
)
def q_semi_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: build a ``map<string,string>`` per row
    (``str_to_map`` over a rendered pair list — the tag-bag shape
    key-value properties take when the key set is open), then exercise
    lookup (``m['k']``), ``map_keys`` (sorted projection), ``size``,
    and ``map_contains_key``. The driver canonicalizer hashes scalars,
    so every map operation is projected back to a scalar; the oracle
    recomputes each from the underlying columns — proving the
    build→access round-trip is lossless, the q_semi_variant pattern
    for the MAP type. Pure map-side (pun intended): everything fuses
    into the scan projection."""
    e = load_table(spark, sf_dir, "events")
    rendered = F.concat(
        F.lit("k:"),
        (F.get_json_object("props", "$.k").cast("long") % 7).cast("string"),
        F.lit(",u:"),
        (F.col("user_id") % 10).cast("string"),
    )
    m = F.expr("str_to_map(rendered, ',', ':')")
    return e.withColumn("rendered", rendered).select(
        "event_id",
        F.size(m).alias("m_size"),
        m.getItem("k").alias("k_val"),
        m.getItem("u").alias("u_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        (F.map_contains_key(m, F.lit("u")) & (m.getItem("u") == "3")).alias(
            "has_u3"
        ),
    )
