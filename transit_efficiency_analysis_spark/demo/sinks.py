"""Sink / null-cleaning demos (SURVEY §2.1 sinks, §2.2 null-clean).

``q_sink_roundtrip`` proves the write path set-based (the reference's
per-row INSERT sink, ``historical_extractor.py:84-88``, becomes one
``df.write``): write parquet + CSV, read both back, verify identical
content via the oracle (which reads the original table).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_null_clean",
    sql="""
    SELECT event_id,
           coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_filled,
           (props IS NOT NULL) AS has_props
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def q_null_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """null-clean: the NaT→None normalization of the reference
    (``realtime_extractor.py:188-189``) generalizes to na.drop/fillna —
    Spark nulls are uniform so this is coalesce + null predicates."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.na.drop(subset=["ts"])
        .select(
            "event_id",
            F.coalesce(k, F.lit(-1)).alias("k_filled"),
            F.col("props").isNotNull().alias("has_props"),
        )
    )


@demo(
    "q_sink_roundtrip",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-parquet + sink-csv: write a slice set-based, read it back —
    the oracle reads the original table, so the round-trip must be
    lossless (schema carried by parquet; CSV re-read with explicit schema)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )
    out_dir = os.path.join(tempfile.gettempdir(), "teas_sink_roundtrip")
    pq_path = os.path.join(out_dir, "slice.parquet")
    csv_path = os.path.join(out_dir, "slice.csv")
    li.write.mode("overwrite").parquet(pq_path)
    li.write.mode("overwrite").option("header", True).csv(csv_path)
    pq = spark.read.parquet(pq_path)
    csv = spark.read.schema(pq.schema).option("header", True).csv(csv_path)
    if pq.exceptAll(csv).count() != 0 or csv.exceptAll(pq).count() != 0:
        raise AssertionError("parquet and csv sink round-trips disagree")
    return pq


@demo(
    "q_sink_partitioned",
    sql="""
    SELECT event_id, user_id, value, event_type
    FROM events WHERE event_type IN ('click', 'purchase')
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-partitioned: hive-style ``partitionBy`` layout — the on-disk
    organization that makes 100 TB tables queryable (a predicate on the
    partition column prunes whole directories before any IO). Writes the
    events table partitioned by event_type, reads it back filtered to two
    of five types, and asserts the filter became a PartitionFilter (not a
    post-scan predicate) before returning."""
    from transit_efficiency_analysis_spark.plans import assert_partition_pruned

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_partitioned_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(
        F.col("event_type").isin("click", "purchase")
    )
    assert_partition_pruned(back, "event_type")
    return back.select("event_id", "user_id", "value", "event_type")


@demo(
    "q_sink_truncate",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 7 = 1
    """,
)
def q_sink_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-truncate: the TRUNCATE + INSERT full rebuild as an atomic
    overwrite (``sinks.overwrite_table`` — versioned dir + symlink flip on
    local paths). Writes one slice, then REBUILDS the live table with a
    different slice where the rebuild plan READS the table it replaces
    (the merge-rebuild shape); the oracle sees only the second slice, so
    stale or merged leftovers fail the gate."""
    from transit_efficiency_analysis_spark.sinks import overwrite_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    table = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_truncate_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    first = overwrite_table(o.where(F.col("o_orderkey") % 7 == 2), table)
    # rebuild reads the live table (anti-join proves the old version stays
    # readable while the new one is written) and replaces it entirely
    replacement = o.where(F.col("o_orderkey") % 7 == 1).join(
        first.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    return overwrite_table(replacement, table)


@demo(
    "q_sink_orc",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_linestatus
    FROM lineitem WHERE l_orderkey % 11 = 4
    """,
)
def q_sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-orc: the columnar-format matrix beyond parquet/csv — write a
    slice as ORC (bundled with Spark, predicate pushdown + column pruning
    like parquet), read it back losslessly; the oracle reads the original
    table."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 11 == 4)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_linestatus")
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_orc_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    li.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@demo(
    "q_sink_schema_evolution",
    sql="""
    SELECT event_id, user_id, value, CAST(NULL AS VARCHAR) AS event_type
    FROM events WHERE event_id % 100 = 0
    UNION ALL
    SELECT event_id, CAST(NULL AS BIGINT), value, event_type
    FROM events WHERE event_id % 100 = 1
    """,
)
def q_sink_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink schema evolution: a long-lived table whose writers added a
    column over time. Batch 1 carries (event_id, user_id, value), batch 2
    drops user_id and adds event_type; a ``mergeSchema`` read unions the
    file schemas and null-fills the gaps — the upgrade path that lets a
    100 TB table evolve without rewriting history. The oracle emulates
    the same union, so the merged read must be lossless."""
    e = load_table(spark, sf_dir, "events")
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_schema_evolution_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    b1 = e.where(F.col("event_id") % 100 == 0).select("event_id", "user_id", "value")
    b2 = e.where(F.col("event_id") % 100 == 1).select("event_id", "value", "event_type")
    b1.write.mode("overwrite").parquet(path)
    b2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.select("event_id", "user_id", "value", "event_type")


@demo(
    "q_validate_expectations",
    sql="""
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM (
        SELECT 'lineitem_shipdate_not_null' AS check_name,
               CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_discount_in_range',
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_quantity_positive',
               CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_pk_unique',
               CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders_orphaned_custkey',
               CAST(count(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    )
    ORDER BY check_name
    """,
)
def q_validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """data-quality expectations report — the gate a pipeline runs before
    accepting an ingested batch: null-rate, range, positivity, PK
    uniqueness, referential integrity. All lineitem row-level checks fold
    into ONE aggregation pass (conditional counters + stack unpivot);
    uniqueness is count-vs-distinct; orphan FKs are an anti-join count.
    The oracle recomputes every counter, so the verdicts are
    hash-verified, not asserted. Output: (check_name, n_violations,
    passed) per check."""
    from transit_efficiency_analysis_spark.operators.validate import (
        referential_check,
        uniqueness_check,
        violation_counters,
    )

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    row_checks = violation_counters(
        li,
        {
            "lineitem_shipdate_not_null": F.col("l_shipdate").isNull(),
            "lineitem_discount_in_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1),
            "lineitem_quantity_positive": F.col("l_quantity") <= 0,
        },
    )
    report = (
        row_checks.unionByName(
            uniqueness_check(li, "lineitem_pk_unique", "l_orderkey", "l_linenumber")
        )
        .unionByName(
            referential_check(o, "o_custkey", c, "c_custkey", "orders_orphaned_custkey")
        )
    )
    return report.orderBy("check_name")


@demo(
    "q_sink_jsonl",
    sql="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink/src-jsonl: newline-delimited JSON round-trip — the interchange
    format data vendors actually ship. Write a slice as JSONL, read it
    back with an explicit schema (schema-on-read: no inference pass over
    100 TB), and return it; the oracle reads the ORIGINAL table, so the
    driver hash proves the round-trip lossless including timestamp
    fidelity (ISO-8601 micros, UTC session zone on both legs)."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_jsonl_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # default JSON format drops micros
    e.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    back = spark.read.schema(e.schema).option("timestampFormat", ts_fmt).json(path)
    return back


@demo(
    "q_sink_dynamic_overwrite",
    sql="""
    SELECT event_id, user_id, value, event_type
    FROM events
    WHERE event_type <> 'click' OR value >= 100
    """,
)
def q_sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-dynamic-partition-overwrite: ``partitionOverwriteMode=dynamic``
    rewrites ONLY the partitions present in the incoming batch — the
    idempotent-backfill primitive at 100 TB (re-running one bad day must
    not truncate the other 3,649). Full table written partitioned by
    event_type, then a 'click'-only batch (filtered to value >= 100)
    overwrites just that partition; the oracle states the expected final
    table, so the driver hash proves the other partitions survived
    untouched and the target partition was fully replaced."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_dynover_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    backfill = e.where((F.col("event_type") == "click") & (F.col("value") >= 100))
    (
        backfill.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(path)
    )
    return spark.read.parquet(path).select(
        "event_id", "user_id", "value", "event_type"
    )


@demo(
    "q_sink_codec_zstd",
    sql="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem WHERE l_orderkey % 13 = 6
    """,
)
def q_sink_codec_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sink-codec: parquet compression is a per-write knob
    (``compression=zstd`` vs the snappy default) — at 100 TB the codec
    choice is a double-digit-percent storage and scan-IO decision, and
    it must be transparent to readers. Writes the same slice with zstd
    AND snappy, verifies both round-trip to identical content, returns
    the zstd read; the oracle reads the original table."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 13 == 6)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_codec_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    zstd_path, snappy_path = base + "_zstd", base + "_snappy"
    li.write.mode("overwrite").option("compression", "zstd").parquet(zstd_path)
    li.write.mode("overwrite").option("compression", "snappy").parquet(snappy_path)
    z = spark.read.parquet(zstd_path)
    s = spark.read.parquet(snappy_path)
    if z.exceptAll(s).count() != 0 or s.exceptAll(z).count() != 0:
        raise AssertionError("zstd and snappy round-trips disagree")
    return z


@demo(
    "q_sink_compaction",
    sql="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                AS DOUBLE) AS sum_value,
           TRUE AS was_fragmented,
           TRUE AS is_compacted
    FROM events GROUP BY event_type
    """,
)
def q_sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the operational task every 100 TB lake
    runs nightly: poll/streaming ingest lands one small file per
    micro-batch (here: a 64-way fragmented copy of the events table),
    and the compactor rewrites each table slice into few large,
    time-clustered files (``repartitionByRange`` on ``ts`` → ~target
    file sizes AND range-clustered row groups, so time-predicate scans
    prune whole files afterwards). Content must be byte-preserved: the
    demo returns per-type aggregates computed FROM THE COMPACTED copy
    while the oracle reads the original table — the driver hash IS the
    losslessness proof. ``was_fragmented`` / ``is_compacted`` pin the
    file-count mechanics (>= 32 fragments in, <= 8 files out) as
    hash-checked verdicts. At scale this runs per partition-directory
    (only partitions whose small-file count crossed a threshold are
    rewritten) behind the atomic versioned-dir overwrite of
    ``sinks.overwrite_table`` — or a Delta OPTIMIZE, which this is the
    storage-agnostic form of."""
    from transit_efficiency_analysis_spark.functions.parity import parity_double

    e = load_table(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        f"teas_compaction_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    frag_path, compact_path = base + "_frag", base + "_compact"
    e.repartition(64).write.mode("overwrite").parquet(frag_path)

    def _n_parts(path: str) -> int:
        return sum(
            1
            for name in os.listdir(path)
            if name.startswith("part-") and name.endswith(".parquet")
        )

    frag = spark.read.parquet(frag_path)
    frag.repartitionByRange(4, "ts").write.mode("overwrite").parquet(
        compact_path
    )
    n_before, n_after = _n_parts(frag_path), _n_parts(compact_path)
    compacted = spark.read.parquet(compact_path)
    return compacted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        parity_double(
            F.sum(F.col("value").cast("decimal(18,6)")), 6
        ).alias("sum_value"),
    ).select(
        "event_type",
        "n_events",
        "sum_value",
        F.lit(n_before >= 32).alias("was_fragmented"),
        F.lit(n_after <= 8).alias("is_compacted"),
    )


@demo(
    "q_sink_xml_roundtrip",
    sql="""
    SELECT doc_id, source, lang, text
    FROM documents WHERE doc_id % 7 = 3
    """,
)
def q_sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML file source/sink (native in Spark 4): write a documents slice
    as row-tagged XML, read it back with an explicit schema. The writer
    escapes XML metacharacters in arbitrary corpus text and the reader
    unescapes them, so the oracle reading the ORIGINAL table proves the
    interchange is byte-lossless — the complement of
    ``q_semi_xml_parse`` (expression-level ``from_xml`` on
    metacharacter-free fragments). XML is the slowest interchange format
    here (row-tag parsing, no columnar projection, no predicate
    pushdown) — it exists for feed interop, not as a lake format; the
    demo pins semantics, SCALE.md points bulk storage at parquet."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 7 == 3)
        .select("doc_id", "source", "lang", "text")
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"teas_sink_xml_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "documents")
        .option("rowTag", "doc")
        .save(path)
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id BIGINT, source STRING, lang STRING, text STRING")
        .load(path)
    )
