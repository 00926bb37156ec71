"""Training-data text preparation demos: chunking, redaction, repetition.

The operators an LLM pre-training pipeline runs after dedup/quality:
split documents into token-window chunks with overlap, scrub PII-shaped
spans, and score boilerplate repetition (max-n-gram-frequency, the
Gopher-style signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.text import words
from transit_efficiency_analysis_spark.operators.dedup import shingles_exploded
from transit_efficiency_analysis_spark.sources.registry import load_table

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # tokens between chunk starts (8-token overlap)


@demo(
    "q_text_chunk",
    sql=f"""
    SELECT doc_id,
           CAST(ci AS INTEGER) AS chunk_idx,
           array_to_string(w[ci * {_STRIDE} + 1 : ci * {_STRIDE} + {_CHUNK}], ' ') AS chunk_text,
           CAST(least(len(w) - ci * {_STRIDE}, {_CHUNK}) AS INTEGER) AS n_tokens
    FROM (
        SELECT doc_id, w,
               unnest(generate_series(0, CAST(greatest(ceil((len(w) - {_CHUNK}) / {_STRIDE}.0), 0) AS BIGINT))) AS ci
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    )
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """document chunking: fixed token windows (32 tokens, stride 24 →
    8-token overlap) — one row per chunk, short final chunk kept."""
    d = load_table(spark, sf_dir, "documents")
    w = words("text")
    n_chunks_minus1 = F.greatest(
        F.ceil((F.size(w) - _CHUNK) / float(_STRIDE)), F.lit(0)
    ).cast("long")
    base = d.select("doc_id", w.alias("w"), F.sequence(F.lit(0), n_chunks_minus1).alias("cis"))
    exploded = base.select("doc_id", "w", F.explode("cis").alias("ci"))
    chunk_text = F.array_join(
        F.slice(F.col("w"), F.col("ci") * _STRIDE + 1, F.lit(_CHUNK)), " "
    )
    n_tokens = F.least(F.size("w") - F.col("ci") * _STRIDE, F.lit(_CHUNK)).cast("int")
    return exploded.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_idx"),
        chunk_text.alias("chunk_text"),
        n_tokens.alias("n_tokens"),
    )


@demo(
    "q_text_redact",
    sql=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(synth, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(synth, '[a-z0-9.]+@[a-z0-9.]+')) AS INTEGER)
               AS n_emails
    FROM (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                   AS synth
        FROM documents
    )
    """,
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped redaction: emails/phones replaced with typed placeholders
    (synthetic PII appended deterministically so the corpus has spans to
    scrub)."""
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    email_pat = "[a-z0-9.]+@[a-z0-9.]+"
    phone_pat = r"\d{3}-\d{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(synth, email_pat, "<EMAIL>"), phone_pat, "<PHONE>"
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(synth, F.lit(email_pat)).alias("n_emails"),
    )


@demo(
    "q_text_repetition",
    sql="""
    SELECT doc_id,
           CAST(max(c) AS INTEGER) AS max_shingle_count,
           CAST(max(c) AS DOUBLE) / sum(c) AS max_shingle_ratio,
           (CAST(max(c) AS DOUBLE) / sum(c)) > 0.1 AS is_repetitive
    FROM (
        SELECT doc_id, s, count(*) AS c
        FROM (
            SELECT doc_id,
                   array_to_string(w[i:i+2], ' ') AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                 unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
        )
        GROUP BY doc_id, s
    )
    GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repetition scoring: most-frequent word-3-gram count and its share of
    all 3-grams (duplicated-n-gram boilerplate signal); docs shorter than
    3 tokens are excluded (no shingles)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(words("text")).alias("pos", "t")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    shingle = F.concat_ws(" ", F.col("t"), F.lead("t", 1).over(w), F.lead("t", 2).over(w))
    sh = (
        toks.select("doc_id", shingle.alias("s"), F.lead("t", 2).over(w).alias("__last"))
        .where(F.col("__last").isNotNull())
        .groupBy("doc_id", "s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return sh.groupBy("doc_id").agg(
        F.max("c").cast("int").alias("max_shingle_count"),
        (F.max("c").cast("double") / F.sum("c")).alias("max_shingle_ratio"),
        ((F.max("c").cast("double") / F.sum("c")) > 0.1).alias("is_repetitive"),
    )


@demo(
    "q_text_pack",
    sql="""
    -- DuckDB's windowed sum(BIGINT) widens to HUGEINT, which would make
    -- bin int128 vs Spark's int64 — CAST keeps the dtype parity.
    SELECT doc_id, source, shard, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
    FROM (
        SELECT doc_id, source, doc_id % 8 AS shard,
               len(string_split(text, ' ')) AS n_tokens,
               sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source, doc_id % 8
                   ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM documents
    )
    """,
)
def q_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence packing: assign each document to a fixed token-budget
    training bin (2048 tokens) by running token offset — the
    concat-and-chunk packing step that turns a filtered corpus into
    context-window examples. Packing is order-dependent by nature, so
    the running sum is windowed per (source, shard) with doc_id order:
    deterministic, and the shard key bounds every window partition at
    1/8 of a source — at 100 TB shard count scales with the corpus so
    no packing task ever sees more than a bounded slice."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            "source",
            (F.col("doc_id") % 8).alias("shard"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "shard",
            "n_tokens",
            F.expr("(cum - n_tokens) div 2048").alias("bin"),
        )
    )


@demo(
    "q_text_pack_concat",
    sql="""
    SELECT source, shard, bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           string_agg(text, ' <|doc|> ' ORDER BY doc_id) AS packed_text
    FROM (
        SELECT doc_id, source, shard, text, n_tokens,
               CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        FROM (
            SELECT doc_id, source, doc_id % 8 AS shard, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY source, doc_id % 8
                       ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum
            FROM documents
        )
    )
    GROUP BY source, shard, bin
    """,
)
def q_text_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence packing, emission step: concatenate each 2048-token bin's
    documents (doc_id order, ``<|doc|>`` separator) into the actual
    training sequence — the step after ``q_text_pack``'s bin assignment.
    Ordered concatenation is done as sort_array(collect_list(struct)) so
    the result is deterministic under any partitioning; per-bin payload is
    bounded by the token budget, so no group ever concentrates more than
    ~2048 tokens of text."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        d.select(
            "doc_id",
            "source",
            (F.col("doc_id") % 8).alias("shard"),
            "text",
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("bin", F.expr("(cum - n_tokens) div 2048"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
        lambda s: s["text"],
    )
    return binned.groupBy("source", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.array_join(ordered, " <|doc|> ").alias("packed_text"),
    )


_K = 5  # duplicated-span k-gram width (min detectable duplicated run)

# Shared oracle fragment: 0-based word-k-gram start positions per doc.
_KG_SQL = f"""
    kg AS (
        SELECT doc_id, g AS pos, array_to_string(w[g + 1 : g + {_K}], ' ') AS kgram
        FROM (
            SELECT doc_id, w, unnest(generate_series(0, len(w) - {_K})) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
            WHERE len(w) >= {_K}
        )
    )
"""


@demo(
    "q_text_dup_spans",
    sql=f"""
    WITH {_KG_SQL},
    dupk AS (
        SELECT kgram FROM kg GROUP BY kgram
        HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT kg.doc_id, kg.pos, kg.pos + {_K} - 1 AS e
        FROM kg JOIN dupk ON kg.kgram = dupk.kgram
    ),
    m AS (
        SELECT doc_id, pos, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos, e,
               sum(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM m
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
           count(*) AS n_dup_starts
    FROM isl GROUP BY doc_id, island
    """,
)
def q_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross-document duplicated spans: maximal token runs covered by
    word-5-grams that also occur in >= 1 other document (exact-substring
    dedup at k-gram granularity, Lee et al. ACL 2022 re-expressed
    Spark-first — see operators/spans.py for the scale analysis: the only
    wide exchanges shuffle k-gram-sized rows, never text)."""
    from transit_efficiency_analysis_spark.operators.spans import duplicated_spans

    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans(d, k=_K)


@demo(
    "q_text_dup_span_removal",
    sql=f"""
    WITH {_KG_SQL},
    dupk AS (
        SELECT kgram, min(doc_id) AS canonical_id
        FROM kg GROUP BY kgram
        HAVING count(DISTINCT doc_id) >= 2
    ),
    covered AS (
        SELECT DISTINCT kg.doc_id, kg.pos + t.o AS cp
        FROM kg JOIN dupk ON kg.kgram = dupk.kgram
        CROSS JOIN range(0, {_K}) AS t(o)
        WHERE kg.doc_id <> dupk.canonical_id
    ),
    toks AS (
        SELECT doc_id, g - 1 AS pos, w[g] AS t
        FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w))) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        )
    ),
    kept AS (
        SELECT * FROM toks k
        WHERE NOT EXISTS (
            SELECT 1 FROM covered c
            WHERE c.doc_id = k.doc_id AND c.cp = k.pos
        )
    ),
    reb AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(t, ' ' ORDER BY pos) AS text_clean
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(string_split(d.text, ' ')) - coalesce(r.n_kept, 0) AS BIGINT)
               AS n_removed,
           coalesce(r.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN reb r ON d.doc_id = r.doc_id
    """,
)
def q_text_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicated-span removal rewrite, keep-first-document semantics:
    for every cross-doc duplicated 5-gram the minimum doc_id is canonical
    and keeps its text; every other document drops the covered tokens and
    is rebuilt (positional anti-join — k x dup-starts exploded positions,
    linear in corpus tokens, no range join)."""
    from transit_efficiency_analysis_spark.operators.spans import (
        remove_duplicated_spans,
    )

    d = load_table(spark, sf_dir, "documents")
    return remove_duplicated_spans(d, k=_K)


@demo(
    "q_text_novelty",
    sql=f"""
    WITH {_KG_SQL},
    dupk AS (
        SELECT kgram FROM kg GROUP BY kgram
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT kg.doc_id,
           count(*) AS n_kgrams,
           count(dupk.kgram) AS n_dup,
           1 - count(dupk.kgram) / count(*) AS novelty
    FROM kg LEFT JOIN dupk ON kg.kgram = dupk.kgram
    GROUP BY kg.doc_id
    """,
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-document novelty score: share of the document's 5-grams that
    appear in no other document (1 - dup/total) — the prioritization
    signal that ranks documents for span removal; one extra groupBy over
    the same k-gram frequency relation as q_text_dup_spans. Documents
    shorter than 5 tokens have no k-grams and are excluded."""
    from transit_efficiency_analysis_spark.operators.spans import novelty_scores

    d = load_table(spark, sf_dir, "documents")
    return novelty_scores(d, k=_K)


@demo(
    "q_text_dup_spans_incremental",
    sql=f"""
    WITH {_KG_SQL},
    batchkg AS (SELECT * FROM kg WHERE doc_id % 10 = 0),
    dupk AS (
        SELECT DISTINCT kgram FROM kg WHERE doc_id % 10 <> 0
        UNION
        SELECT kgram FROM batchkg GROUP BY kgram
        HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT b.doc_id, b.pos, b.pos + {_K} - 1 AS e
        FROM batchkg b JOIN dupk ON b.kgram = dupk.kgram
    ),
    m AS (
        SELECT doc_id, pos, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos, e,
               sum(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM m
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(pos) + 1 AS BIGINT) AS span_tokens,
           count(*) AS n_dup_starts
    FROM isl GROUP BY doc_id, island
    """,
)
def q_text_dup_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental duplicated-span detection — every tenth document plays
    the NEW BATCH, the rest the standing corpus. A batch position is
    duplicated when its 5-gram occurs in the corpus OR in another batch
    doc — provably the full q_text_dup_spans criterion restricted to
    batch docs (property-tested equality in tests/test_spans_budget.py),
    so dedup-at-ingest preserves the full-recompute invariant while the
    per-batch cost tracks the batch: the corpus side is a maintained
    distinct-k-gram table in production (operators/spans.py)."""
    from transit_efficiency_analysis_spark.operators.spans import (
        duplicated_spans_incremental,
    )

    d = load_table(spark, sf_dir, "documents")
    return duplicated_spans_incremental(
        d.where(F.col("doc_id") % 10 != 0),
        d.where(F.col("doc_id") % 10 == 0),
        k=_K,
    )
