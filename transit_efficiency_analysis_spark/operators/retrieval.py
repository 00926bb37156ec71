"""Lexical retrieval over a document corpus: BM25 and TF-IDF.

Training-data pipelines use lexical retrieval for targeted corpus mining
(pull documents matching a seed query), decontamination forensics, and as
the sparse half of hybrid (sparse+dense) search next to the ANN operators
in ``operators/similarity.py``. Not present in the reference repo
(reference scope is transit analytics; this is the LLM-pipeline extension
family, SURVEY §2.7).

Design for scale:

- One ``explode`` over the tokenized corpus feeds every statistic
  (term frequencies, document frequencies, document lengths) — one
  shuffle keyed by ``(doc, term)`` then one tiny one keyed by ``term``;
  no per-term passes over the corpus.
- Per-term document frequencies and the corpus-level scalars (N docs,
  total tokens) are small after aggregation and are **broadcast** back
  onto the (doc, term) rows — the scoring itself is map-side only.
- Top-k selection is ``orderBy().limit(k)``, which Spark plans as
  TakeOrderedAndProject: per-partition heaps + a k-row driver merge, no
  global sort shuffle.

Cross-engine exactness: scores are computed in **non-negative BIGINT
arithmetic** (integer ``div`` / ``%``, bit-identical between Spark and
DuckDB ``//`` / ``%``) and emitted as parts-per-million integers. The
standard BM25 idf is ``ln((N - df + ½) / (df + ½))``; ``ln`` is
transcendental and not guaranteed bit-identical across engines, so the
oracle-parity scoring uses the **rational idf**
``(N - df + ½) / (df + ½) = (2N - 2df + 1) / (2df + 1)`` — the same
monotone document-frequency discounting, exactly representable. The
classic log idf is available via ``idf="log"`` for production ranking.
The two idfs order documents identically for rare terms (df < N/2, the
regime retrieval cares about); for corpus-majority terms the log idf goes
negative while the rational idf stays positive — pytest covers both
regimes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.functions.text import words

_M = 1_000_000


def idiv(a: Column, b: Column) -> Column:
    """Integer floor division (Spark SQL ``div``; DuckDB ``//``)."""
    return F.call_function("div", a, b)


def ppm_div(num: Column, den: Column) -> Column:
    """``floor(num * 1e6 / den)`` in exact BIGINT arithmetic.

    ``num * 1e6`` can overflow int64 when ``num`` nears 9.2e12, so the
    scaling is split: ``(num div den)·1e6 + ((num % den)·1e6) div den``.
    Exact while the RESULT fits int64 — i.e. ``num/den < 9.2e12`` — and
    ``den < 9.2e12`` (so the remainder re-scale ``(num % den)·1e6`` fits);
    outside that Spark's ANSI mode fails loudly rather than wrapping.
    BM25/TF-IDF ratios are idf·saturation-bounded (≈ 2N), so the envelope
    holds to ~10^9 documents. Oracle twin:
    ``(num // den) * 1000000 + ((num % den) * 1000000) // den``.
    """
    m = F.lit(_M).cast("long")
    return idiv(num, den) * m + idiv((num % den) * m, den)


def _token_stats(docs: DataFrame, id_col: str, text_col: str):
    """(per-doc tokens with length, corpus scalar stats) shared by both
    retrieval operators. ``dl`` (document length) rides the exploded rows
    so no second join against the corpus is needed."""
    from transit_efficiency_analysis_spark.operators.parallel import (
        ensure_min_parallelism,
    )

    # tokenization (split + explode) is the per-row-expensive work of
    # every retrieval operator and otherwise runs inside the one-task
    # scan stage of a single-row-group input — once per consuming
    # branch (round 18, guide §2.5; no-op whenever splits ≥ cores).
    # Measured at sf0.1/local[32]: q_retrieval_tfidf 4.2 → 1.5 s.
    docs = ensure_min_parallelism(docs)
    toks = docs.select(
        F.col(id_col),
        F.size(words(text_col)).cast("long").alias("dl"),
        F.explode(words(text_col)).alias("term"),
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words(text_col)).cast("long")).alias("n_tokens"),
    )
    return toks, stats


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    idf: str = "rational",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (k1 = 6/5, b = 3/4 — the textbook 1.2 / 0.75 as exact rationals).

    Per matched (doc, term):

        score_term = idf(df) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with avgdl = n_tokens/n_docs. Multiplying numerator and denominator
    by ``10·n_tokens`` clears every fraction::

        num = (2N − 2df + 1) · 22 · tf · T
        den = (2df + 1) · (10·T·tf + 3·T + 9·dl·N)

    (T = n_tokens, N = n_docs) and the term score becomes the exact
    integer ``ppm_div(num, den)``; a document's score is the plain BIGINT
    sum over its matched terms — order-free, bit-identical across
    engines. ``idf="log"`` swaps the rational idf for
    ``ln((N − df + ½)/(df + ½))`` (double; production ranking).

    Returns ``(id_col, n_terms_hit, bm25_ppm)`` sorted by
    ``bm25_ppm DESC, id_col`` limited to ``k`` (deterministic: the
    tie-break makes the limit unambiguous).
    """
    if idf not in ("rational", "log"):
        raise ValueError(f"idf must be 'rational' or 'log', got {idf!r}")
    toks, stats = _token_stats(docs, id_col, text_col)
    tf = (
        toks.where(F.col("term").isin(query_terms))
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("tf"),
            F.col("df"),
            F.col("dl"),
            F.col("n_docs").alias("N"),
            F.col("n_tokens").alias("T"),
        )
    )
    num = (2 * F.col("N") - 2 * F.col("df") + 1) * 22 * F.col("tf") * F.col("T")
    den = (2 * F.col("df") + 1) * (
        10 * F.col("T") * F.col("tf") + 3 * F.col("T") + 9 * F.col("dl") * F.col("N")
    )
    if idf == "rational":
        term_score = ppm_div(num, den).alias("score")
    else:
        sat = F.lit(_M).cast("double") * (
            F.log(
                (F.col("N").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (22 * F.col("tf") * F.col("T"))
            / den.cast("double")
        )
        term_score = sat.alias("score")
    return (
        scored.select(F.col(id_col), term_score)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("score").alias("bm25_ppm"),
        )
        .orderBy(F.col("bm25_ppm").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
    max_df_ratio: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Top-n characteristic terms per document by TF-IDF.

    tfidf = (tf/dl) · (N/df) — kept rational: ``tfidf_ppm =
    (tf·N·1e6) div (dl·df)`` (exact; ``tf·N·1e6`` stays under int64 up
    to ~10^8 documents — past that, route through :func:`ppm_div`).
    Terms appearing in more than ``max_df_ratio`` (default ½) of all
    documents are dropped as corpus-ubiquitous before ranking. Ranking
    is a window partitioned BY DOCUMENT — per-partition cardinality is
    one document's vocabulary, so the window never concentrates the
    corpus into one task.

    Returns ``(id_col, term, term_rank, tfidf_ppm)``.
    """
    from pyspark.sql import Window

    toks, stats = _token_stats(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ratio_num, ratio_den = max_df_ratio
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .where(F.col("df") * ratio_den <= F.col("n_docs") * ratio_num)
        .select(
            F.col(id_col),
            F.col("term"),
            idiv(
                F.col("tf") * F.col("n_docs") * _M, F.col("dl") * F.col("df")
            ).alias("tfidf_ppm"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_ppm").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= top_n)
        .select(id_col, "term", "term_rank", "tfidf_ppm")
    )
