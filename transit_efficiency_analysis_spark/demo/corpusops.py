"""Corpus-analysis demos: range join, n-gram statistics, weighted sampling.

Three more training-pipeline shapes over the testdata tables, each with an
exact DuckDB twin: the bucketed point-in-interval join (the range-join
operator family), corpus-wide bigram frequency (contamination forensics /
distribution analysis), and importance-weighted deterministic sampling
(md5-uniform draw against a per-row weight — reproducible across engines
and partitionings, unlike ``df.sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.operators.buckets import cap_buckets
from transit_efficiency_analysis_spark.operators.rangejoin import interval_point_join
from transit_efficiency_analysis_spark.sources.registry import load_table


@demo(
    "q_join_range_interval",
    sql="""
    SELECT e.event_id, e.value, p.p_partkey, p.p_size * 10 - 3 AS lo,
           p.p_size * 10 + 7 AS hi
    FROM (SELECT event_id, value FROM events WHERE event_id % 20 = 0) e
    JOIN part p ON p.p_size * 10 - 3 <= e.value AND e.value < p.p_size * 10 + 7
    """,
)
def q_join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range join: sampled event values against per-part intervals
    [10·size−3, 10·size+7) via the bucketed interval_point_join — a
    bucket equi-join + residual filter instead of the
    BroadcastNestedLoopJoin a raw non-equi predicate plans."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") % 20 == 0)
        .select("event_id", "value")
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_size") * 10 - 3).alias("lo"),
        (F.col("p_size") * 10 + 7).alias("hi"),
    )
    return interval_point_join(e, p, "value", "lo", "hi", bucket_width=10).select(
        "event_id", "value", "p_partkey", "lo", "hi"
    )


@demo(
    "q_text_ngram_stats",
    sql="""
    SELECT bigram, n, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT bigram, n,
               row_number() OVER (ORDER BY n DESC, bigram ASC) AS rank
        FROM (
            SELECT w[g] || ' ' || w[g + 1] AS bigram, count(*) AS n
            FROM (
                SELECT w, unnest(generate_series(1, len(w) - 1)) AS g
                FROM (SELECT string_split(text, ' ') AS w FROM documents)
                WHERE len(w) >= 2
            )
            GROUP BY w[g] || ' ' || w[g + 1]
        )
    )
    WHERE rank <= 20
    """,
)
def q_text_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus bigram frequency, top-20 (count desc, bigram asc) — the
    n-gram distribution scan behind contamination forensics and
    boilerplate detection. One explode + one partial-agg groupBy; the
    top-k is a TakeOrdered, not a global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"
    )
    counts = (
        d.select(w.alias("w"))
        .where(F.size("w") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # top-k first (TakeOrderedAndProject — per-partition heaps, no global
    # sort of the full bigram vocabulary), then rank the 20 survivors; the
    # unpartitioned window only ever sees k rows.
    top = counts.orderBy(F.col("n").desc(), F.col("bigram").asc()).limit(20)
    rank_w = Window.partitionBy(F.lit(1)).orderBy(F.col("n").desc(), F.col("bigram").asc())
    return top.withColumn("rank", F.row_number().over(rank_w).cast("int"))


@demo(
    "q_sample_rebalance",
    sql="""
    WITH m AS (
        SELECT min(cnt) AS m
        FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
    )
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ), m
    WHERE rk <= m
    """,
)
def q_sample_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain-mix rebalancing: downsample every language to the size of
    the smallest one (uniform mix — the training-data curation step that
    stops one domain from dominating a pretraining batch). Selection is
    deterministic md5(doc_id) order per language via the storm-safe
    ``cap_buckets`` operator, so at 100 TB the dominant language never
    lands in a single ranking task. The cap itself is a driver-side
    sizing aggregate (one groupBy over lang, |langs| rows)."""
    d = load_table(spark, sf_dir, "documents")
    m = min(
        r["cnt"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    return cap_buckets(
        d.select("doc_id", "lang", "n_chars"), ["lang"], "doc_id", m
    ).select("doc_id", "lang", "n_chars")


@demo(
    "q_sample_weighted",
    sql="""
    SELECT doc_id, lang, n_chars,
           CAST(least(n_chars, 400) AS DOUBLE) / 400 AS weight
    FROM documents
    WHERE CAST('0x' || substr(md5('wsample|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          < CAST(least(n_chars, 400) AS DOUBLE) / 400 * 4294967296
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """importance-weighted deterministic sample: keep each doc with
    probability min(n_chars,400)/400 — longer docs oversampled — by
    comparing a keyed md5-uniform draw (first 8 hex chars as a 32-bit
    integer) against the per-row weight. Reproducible and resumable:
    the draw depends only on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars"), F.lit(400)).cast("double") / 400
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return d.where(draw < weight * F.lit(float(2**32))).select(
        "doc_id", "lang", "n_chars", weight.alias("weight")
    )


def _prep_pipeline_sql() -> str:
    from transit_efficiency_analysis_spark.demo.textops import _LANGS, _sql_hits

    preds = " ".join(f"WHEN s_{lang} = g THEN '{lang}'" for lang in _LANGS)
    hits = ", ".join(f"{_sql_hits(lang)} AS s_{lang}" for lang in _LANGS)
    greatest = ", ".join(f"s_{lang}" for lang in _LANGS)
    return f"""
    WITH scored AS (
        SELECT doc_id, source, text, w, len(w) AS n_words,
               CASE WHEN g = 0 THEN 'und' {preds} END AS predicted_lang
        FROM (
            SELECT doc_id, source, text, w, {hits}, greatest({greatest}) AS g
            FROM (SELECT doc_id, source, text, string_split(text, ' ') AS w
                  FROM documents)
        )
    ),
    kept AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS ck,
               CAST(n_words AS BIGINT) AS n_tokens
        FROM scored
        WHERE predicted_lang = 'en'
          AND n_words BETWEEN 20 AND 90
          AND CAST(len(list_distinct(w)) AS DOUBLE) / n_words > 0.2
    ),
    dedup AS (
        SELECT doc_id, source, n_tokens FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY ck) AS canon FROM kept
        ) WHERE doc_id = canon
    )
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
    FROM (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source, doc_id % 8
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM dedup
    )
    """


@demo("q_corpus_prep_pipeline", sql=_prep_pipeline_sql())
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation — the operator families COMPOSED the
    way a real pre-training data pipeline chains them: language-ID filter
    (keep predicted 'en') → quality gate (length + lexical diversity) →
    exact dedup (first-writer-wins on the order-insensitive content key)
    → sequence packing (per-(source, shard) running token offset → 2048-
    token training bins). Every stage is the same column algebra as its
    standalone demo (q_text_langid / q_text_quality / q_dedup_exact /
    q_text_pack), so the composition stays one declarative plan: Catalyst
    fuses the three map-side filters into the scan projection, and the
    only shuffles are the dedup key window and the bounded pack window."""
    from transit_efficiency_analysis_spark.demo.textops import _LANGS
    from transit_efficiency_analysis_spark.functions.text import (
        LANG_STOPWORDS,
        stopword_hits,
        words,
    )

    d = load_table(spark, sf_dir, "documents")
    w = words("text")
    scores = {lang: stopword_hits(w, LANG_STOPWORDS[lang]) for lang in _LANGS}
    g = F.greatest(*scores.values())
    pred = F.when(g == 0, F.lit("und"))
    for lang in _LANGS:
        pred = pred.when(scores[lang] == g, F.lit(lang))
    n_words = F.size(w)
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    kept = (
        d.select(
            "doc_id",
            "source",
            pred.alias("predicted_lang"),
            n_words.alias("n_words"),
            distinct_ratio.alias("distinct_ratio"),
            F.md5(F.array_join(F.array_sort(F.array_distinct(w)), " ")).alias("ck"),
            n_words.cast("long").alias("n_tokens"),
        )
        .where(
            (F.col("predicted_lang") == "en")
            & F.col("n_words").between(20, 90)
            & (F.col("distinct_ratio") > 0.2)
        )
    )
    canon = F.min("doc_id").over(Window.partitionBy("ck"))
    dedup = (
        kept.withColumn("canon", canon)
        .where(F.col("doc_id") == F.col("canon"))
        .select("doc_id", "source", "n_tokens")
    )
    pack_w = (
        Window.partitionBy("source", F.col("doc_id") % 8)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dedup.withColumn("cum", F.sum("n_tokens").over(pack_w)).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("(cum - n_tokens) div 2048").alias("bin"),
    )


@demo(
    "q_clean_winsorize",
    sql="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
        SELECT event_type,
               max(CASE WHEN rn = greatest(1, (n * 5 + 99) // 100) THEN value END) AS lo,
               max(CASE WHEN rn = greatest(1, (n * 95 + 99) // 100) THEN value END) AS hi
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           greatest(b.lo, least(b.hi, e.value)) AS value_clipped,
           (e.value < b.lo OR e.value > b.hi) AS was_clipped
    FROM events e JOIN bounds b USING (event_type)
    WHERE e.value IS NOT NULL
    """,
)
def q_clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """winsorization: clip values to per-group exact [p05, p95] — the
    outlier-capping step before metrics feed training or dashboards. The
    percentile bounds are DISCRETE exact elements at rank ``ceil(q·n)``
    (pure integer arithmetic, one conditional-max agg over the ranked
    rows — bit-identical across engines, same trick as
    ``q_approx_quantiles``); the tiny per-group bounds table broadcasts
    back, so the clipping pass is map-side."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ranked = e.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    lo_rn = F.expr("greatest(1, (n * 5 + 99) div 100)")
    hi_rn = F.expr("greatest(1, (n * 95 + 99) div 100)")
    bounds = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("value"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("value"))).alias("hi"),
    )
    return e.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value"))).alias(
            "value_clipped"
        ),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


@demo(
    "q_clean_mad_outliers",
    sql="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type, max(n) AS n_rows,
               max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS median_value
        FROM ranked GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.n_rows, m.median_value,
               abs(e.value - m.median_value) AS absdev,
               row_number() OVER (PARTITION BY e.event_type
                                  ORDER BY abs(e.value - m.median_value)) AS rn
        FROM events e JOIN med m USING (event_type)
        WHERE e.value IS NOT NULL
    )
    ,
    mad AS (
        SELECT event_type,
               max(CASE WHEN rn = (n_rows + 1) // 2 THEN absdev END) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(max(d.n_rows) AS BIGINT) AS n_rows,
           max(d.median_value) AS median_value,
           max(m.mad) AS mad,
           CAST(sum(CASE WHEN d.absdev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_clean_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation: per group,
    the exact discrete median (rank ``(n+1) div 2`` — integer-exact
    element selection, the q_clean_winsorize device), then the exact
    median of ``|value - median|``, then the count of rows beyond
    3 x MAD. Median/MAD resist the very outliers they hunt (unlike
    mean/stddev), which is why corpus quality gates prefer them. Two
    key-partitioned ranking passes and two broadcast joins of per-group
    scalars — the per-group sort is the unavoidable cost of EXACT
    medians (the approximate path is ``q_approx_quantiles``); both
    ranked elements are selected by value order, so ties cannot change
    the selected value and the result is partition-invariant."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    ranked = e.select(
        "event_type",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("value"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_rows"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("value"))
        ).alias("median_value"),
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n_rows",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("absdev"),
    )
    dev_ranked = dev.select(
        "*",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("absdev"))
        .alias("rn"),
    )
    mad = dev_ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n_rows + 1) div 2"), F.col("absdev"))
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("median_value").alias("median_value"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("absdev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@demo(
    "q_corpus_token_budget",
    sql="""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               len(list_distinct(w)) / len(w) AS quality
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    tot AS (SELECT sum(n_tokens) // 4 AS budget FROM scored),
    c AS (
        SELECT doc_id, n_tokens, quality,
               CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, quality, cum_tokens
    FROM c, tot WHERE cum_tokens <= budget
    """,
)
def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token-budget corpus selection: rank documents by lexical-diversity
    quality (distinct-token ratio, doc_id tiebreak) and keep the best
    prefix whose cumulative token count stays within 25% of the corpus
    total. The running sum is the DISTRIBUTED two-pass prefix sum from
    operators/budget.py — range-partition on the selection order,
    per-bucket subtotals (the only unpartitioned window sees n_buckets
    rows), broadcast offsets, within-bucket window — NOT a naive global
    Window.orderBy that would collapse 100 TB into one task. The oracle
    states the same semantics as the naive single-window SQL; the output
    is partitioning-invariant because the order key is total."""
    from transit_efficiency_analysis_spark.operators.budget import running_total

    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    scored = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(w)) / F.size(w)).alias("quality"),
    )
    budget = scored.agg(
        (F.sum("n_tokens") / F.lit(4)).cast("long").alias("budget")
    )
    cum = running_total(
        scored,
        order_by=[F.col("quality").desc(), F.col("doc_id").asc()],
        weight="n_tokens",
        cum_col="cum_tokens",
        n_buckets=8,
        # monotone along quality DESC; deterministic literal-boundary
        # bucket id, never spark_partition_id (ADVICE r9)
        bucket_by=-F.col("quality"),
    )
    return (
        cum.join(F.broadcast(budget))
        .where(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "n_tokens", "quality", "cum_tokens")
    )


@demo(
    "q_corpus_domain_affinity",
    sql="""
    WITH feats AS (
        SELECT doc_id, tgt,
               CAST('0x' || substr(md5(w[g] || ' ' || w[g + 1]), 1, 8) AS BIGINT)
                   % 64 AS b
        FROM (
            SELECT doc_id, (source = 'src0') AS tgt, w,
                   unnest(generate_series(1, len(w) - 1)) AS g
            FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                  FROM documents)
            WHERE len(w) >= 2
        )
    ),
    buckets AS (
        SELECT b,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) + 1 AS t_b,
               sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) + 1 AS r_b
        FROM feats GROUP BY b
    ),
    tot AS (SELECT sum(t_b) AS tt, sum(r_b) AS rr FROM buckets),
    ratios AS (
        SELECT b,
               CAST(CAST(t_b AS HUGEINT) * rr * 1000000
                    // (CAST(r_b AS HUGEINT) * tt) AS BIGINT) AS ppm
        FROM buckets, tot
    ),
    scores AS (
        SELECT f.doc_id, count(*) AS n_feats, sum(r.ppm) AS s
        FROM feats f JOIN ratios r ON f.b = r.b
        GROUP BY f.doc_id
    )
    SELECT doc_id, n_feats, CAST(s // n_feats AS BIGINT) AS affinity_ppm
    FROM scores
    """,
)
def q_corpus_domain_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashed-bigram domain-affinity scoring (the DSIR / fastText-filter
    data-selection shape): every document scored by how much its hashed
    bigram profile matches the TARGET domain (source = 'src0'), as the
    count-weighted mean of per-bucket target/raw frequency ratios in
    exact ppm integers (add-one smoothed; DECIMAL(38,0)/HUGEINT integral
    division proven bit-equal across engines). The 64-row ratio table
    broadcasts — scoring is one bigram explode + one doc-keyed agg
    regardless of corpus size (operators/affinity.py)."""
    from transit_efficiency_analysis_spark.operators.affinity import (
        domain_affinity_scores,
    )

    d = load_table(spark, sf_dir, "documents")
    return domain_affinity_scores(d, F.col("source") == "src0")
