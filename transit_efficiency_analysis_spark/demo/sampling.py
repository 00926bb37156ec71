"""Deterministic sampling + histogram + edit-distance demos.

Training-data pipelines need *reproducible* samples — ``df.sample()`` is
seed-and-partitioning dependent, so these operators sample by content hash
(md5), which is stable across engines, partitionings, and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_sample_hash",
    sql="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5('sample1|' || CAST(doc_id AS VARCHAR)), 1, 2) < '2a'
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deterministic ~16% Bernoulli sample by keyed md5 (salt 'sample1') —
    reproducible regardless of partitioning, unlike df.sample()."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.concat(F.lit("sample1|"), F.col("doc_id").cast("string"))), 1, 2)
    return d.where(h < "2a").select("doc_id", "lang", "n_chars")


@demo(
    "q_sample_stratified",
    sql="""
    SELECT doc_id, lang
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5('strat|' || CAST(doc_id AS VARCHAR))) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    WHERE rn * 5 <= n
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stratified 20% sample per language: rank rows by keyed hash within
    each stratum, keep the first n/5 (exact integer predicate — no float
    fraction comparisons)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h)
    wc = Window.partitionBy("lang")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") * 5 <= F.col("n"))
        .select("doc_id", "lang")
    )


@demo(
    "q_agg_histogram",
    sql="""
    SELECT CAST(least(floor(o_totalprice / 60000), 9) AS INTEGER) AS bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY CAST(least(floor(o_totalprice / 60000), 9) AS INTEGER)
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fixed-width histogram (10 buckets of 60k, top-clamped) — the
    dashboard distribution shape."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 60000), F.lit(9)).cast("int")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@demo(
    "q_dedup_editdistance",
    sql="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS INTEGER)
               AS edit_distance
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.n_chars // 50 = b.n_chars // 50 AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 20
    """,
)
def q_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edit-distance near-dup: levenshtein over 40-char prefixes within
    (lang, length-bucket) blocks — the character-level dedup flavor
    (exact integer metric, identical on both engines)."""
    from transit_efficiency_analysis_spark.operators.parallel import (
        ensure_min_parallelism,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 50).alias("lb"),
        F.substring("text", 1, 40).alias("prefix"),
    )
    # The blocked self-join broadcasts the 5k-row block table, so the
    # O(pairs × 40²) levenshtein DP otherwise runs inside the one-task
    # scan stage of the single-row-group testdata file (round 18, guide
    # §2.5; no-op whenever splits ≥ cores). Measured at sf0.1/local[32]:
    # 10.4 → 1.2 s, identical pair set.
    d = ensure_min_parallelism(d)
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= 20)
    )


@demo(
    "q_sample_split",
    sql="""
    SELECT CASE WHEN h < 'cc' THEN 'train'
                WHEN h < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs
    FROM (
        SELECT lang, n_chars,
               substr(md5('split1|' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
        FROM documents
    )
    GROUP BY 1
    """,
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deterministic train/val/test corpus split (~80/10/10) by keyed md5
    of doc_id — membership is a pure function of the row, so the split is
    reproducible across engines, partitionings, and re-runs, and a
    document can never migrate between splits when the corpus grows (the
    property that keeps eval sets uncontaminated as a 100 TB corpus is
    re-snapshotted). Hex-prefix thresholds ('cc' = 204/256, 'e6' = 230/256)
    keep the comparison a plain string compare on both engines."""
    d = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("split1|"), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@demo(
    "q_sample_temperature",
    sql="""
    WITH counts AS (
        SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    floor_n AS (SELECT min(n_docs) AS n_min FROM counts),
    fracs AS (
        SELECT lang, n_docs,
               sqrt(CAST(n_min AS DOUBLE) / n_docs) AS keep_frac
        FROM counts CROSS JOIN floor_n
    ),
    kept AS (
        SELECT d.lang,
               CASE WHEN CAST('0x' || substr(md5('temp1|' ||
                            CAST(d.doc_id AS VARCHAR)), 1, 13) AS BIGINT)
                    < f.keep_frac * 4503599627370496 THEN 1 ELSE 0 END AS k
        FROM documents d JOIN fracs f USING (lang)
    )
    SELECT f.lang, f.n_docs, f.keep_frac,
           CAST(sum(k.k) AS BIGINT) AS n_sampled
    FROM kept k JOIN fracs f USING (lang)
    GROUP BY f.lang, f.n_docs, f.keep_frac
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (alpha = 0.5): per-language keep
    fraction ``sqrt(n_min / n_lang)`` — the smallest language is kept in
    full, dominant languages are downsampled toward a flatter mixture
    (the standard pre-training reweighting that stops one language or
    domain from swamping the mix). Membership is a pure row predicate —
    a 52-bit keyed-md5 uniform compared against the fraction — so the
    sampled corpus is REPRODUCIBLE under any partitioning and stable
    under corpus growth (q_sample_split's device, here with per-stratum
    rates). The fraction arithmetic is one IEEE division and one sqrt
    (both correctly rounded -> bit-identical across engines), the
    threshold ``frac * 2^52`` compares against an exact dyadic integer,
    and the per-language fraction table is a broadcast join; nothing
    shuffles the documents themselves."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    floor_n = counts.agg(F.min("n_docs").alias("n_min"))
    fracs = counts.crossJoin(F.broadcast(floor_n)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs")).alias(
            "keep_frac"
        ),
    )
    u52 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("temp1|"), F.col("doc_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    kept = d.join(F.broadcast(fracs), "lang").select(
        "lang",
        "n_docs",
        "keep_frac",
        F.when(
            u52 < F.col("keep_frac") * F.lit(float(2**52)), 1
        ).otherwise(0).alias("k"),
    )
    return kept.groupBy("lang", "n_docs", "keep_frac").agg(
        F.sum("k").alias("n_sampled")
    )
