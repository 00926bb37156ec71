"""Lexical-retrieval demos: BM25 corpus mining and TF-IDF term profiling.

Driver-verified twins for ``operators/retrieval.py`` (LLM-pipeline
extension family, SURVEY §2.7 — not in the reference repo). Both oracles
mirror the operators' exact non-negative BIGINT ppm arithmetic (rational
idf — see the operator module docstring), so the driver hash is bit-exact,
not tolerance-based. DuckDB's ``sum(BIGINT)`` / ``row_number()`` widen to
HUGEINT/BIGINT where Spark stays long/int, hence the explicit CASTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
)
from transit_efficiency_analysis_spark.operators.similarity import brute_force_topk
from transit_efficiency_analysis_spark.sources.registry import load_table

#: Seed query for corpus mining: one rare term (df≈5% of docs at the test
#: scales) plus two corpus-common terms — exercises both idf regimes.
_QUERY_TERMS = ["dup", "hash", "merge"]
_TOP_K = 10

#: Drop terms present in >90% of documents. The synthetic corpus has a
#: near-ubiquitous vocabulary (most terms sit at df/N ≈ 0.75-0.80), so the
#: textbook ½ cutoff would keep almost nothing; the cutoff is a ratio, so
#: the semantics are scale-invariant either way.
_MAX_DF_RATIO = (9, 10)
_TOP_N_TERMS = 3


#: BM25 scoring as DuckDB CTEs, parameterized by top-k — shared by the
#: standalone demo and the RRF fusion oracle.
def _bm25_sql(k: int) -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS N,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS T
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, dl, count(*) AS tf
        FROM toks
        WHERE term IN ('dup', 'hash', 'merge')
        GROUP BY doc_id, term, dl
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               (2 * s.N - 2 * d.df + 1) * 22 * tf.tf * s.T AS num,
               (2 * d.df + 1)
                   * (10 * s.T * tf.tf + 3 * s.T + 9 * tf.dl * s.N) AS den
        FROM tf
        JOIN dfreq d USING (term)
        CROSS JOIN stats s
    ),
    bm25 AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_terms_hit,
               CAST(sum((num // den) * 1000000
                        + ((num % den) * 1000000) // den) AS BIGINT) AS bm25_ppm
        FROM scored
        GROUP BY doc_id
        ORDER BY bm25_ppm DESC, doc_id
        LIMIT {k}
    )
    """


@demo(
    "q_retrieval_bm25",
    sql=_bm25_sql(_TOP_K) + "SELECT doc_id, n_terms_hit, bm25_ppm FROM bm25",
)
def q_retrieval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k corpus mining (rational idf, exact ppm integers):
    rank documents for a bag-of-words seed query — the sparse-retrieval
    workhorse for targeted corpus mining and decontamination forensics.
    One corpus explode feeds every statistic; df/scalars broadcast back;
    top-k is TakeOrderedAndProject, never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, _QUERY_TERMS, k=_TOP_K)


@demo(
    "q_retrieval_tfidf",
    sql=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    stats AS (SELECT count(*) AS N FROM documents),
    tf AS (
        SELECT doc_id, term, dl, count(*) AS tf
        FROM toks
        GROUP BY doc_id, term, dl
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id, tf.term,
               (tf.tf * s.N * 1000000) // (tf.dl * d.df) AS tfidf_ppm
        FROM tf
        JOIN dfreq d USING (term)
        CROSS JOIN stats s
        WHERE d.df * {_MAX_DF_RATIO[1]} <= s.N * {_MAX_DF_RATIO[0]}
    )
    SELECT doc_id, term, CAST(term_rank AS INTEGER) AS term_rank, tfidf_ppm
    FROM (
        SELECT doc_id, term, tfidf_ppm,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf_ppm DESC, term
               ) AS term_rank
        FROM scored
    )
    WHERE term_rank <= {_TOP_N_TERMS}
    """,
)
def q_retrieval_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-n characteristic terms per document (exact ppm
    integers): the per-document sparse signature used for clustering,
    topic tagging, and near-dup triage. The ranking window partitions BY
    DOCUMENT, so no task ever sees more than one document's vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, top_n=_TOP_N_TERMS, max_df_ratio=_MAX_DF_RATIO)


#: RRF fusion depth per list and final cut.
_RRF_DEPTH = 50
_RRF_K = 60  # the standard RRF dampening constant
_RRF_CUT = 10

#: Dense query: the document whose embedding seeds the similarity side.
_RRF_QUERY_VEC = 0


def _rrf_sql() -> str:
    from transit_efficiency_analysis_spark.demo.similarity import _COS_SQL

    return (
        _bm25_sql(_RRF_DEPTH)
        + f""",
    sparse AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25_ppm DESC, doc_id)
                    AS INTEGER) AS sparse_rank
        FROM bm25
    ),
    dense AS (
        SELECT doc_id, dense_rank FROM (
            SELECT b.vec_id AS doc_id,
                   CAST(row_number() OVER (ORDER BY {_COS_SQL} DESC, b.vec_id ASC)
                        AS INTEGER) AS dense_rank
            FROM embeddings a
            JOIN embeddings b
              ON a.vec_id = {_RRF_QUERY_VEC} AND b.vec_id <> {_RRF_QUERY_VEC}
        )
        WHERE dense_rank <= {_RRF_DEPTH}
    )
    SELECT doc_id, sparse_rank, dense_rank,
           CAST(coalesce(1000000 // ({_RRF_K} + sparse_rank), 0)
                + coalesce(1000000 // ({_RRF_K} + dense_rank), 0) AS BIGINT)
               AS rrf_ppm
    FROM sparse
    FULL OUTER JOIN dense USING (doc_id)
    ORDER BY rrf_ppm DESC, doc_id
    LIMIT {_RRF_CUT}
    """
    )


@demo("q_retrieval_hybrid_rrf", sql=_rrf_sql())
def q_retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval via reciprocal-rank fusion:
    ``rrf(d) = Σ_lists 1/(60 + rank_list(d))`` in exact ppm integers —
    the standard way to combine BM25 with embedding ANN without score
    calibration. Each side contributes its top-50 ranking (BM25 over the
    seed query terms; exact cosine against document {_RRF_QUERY_VEC}'s
    embedding); fusion is a tiny outer join of two ≤50-row lists, so the
    unpartitioned rank windows here never see more than the fused heads —
    at 100 TB the heavy lifting stays in the bounded-candidate BM25 and
    ANN operators themselves."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    sparse = bm25_topk(d, _QUERY_TERMS, k=_RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_ppm").desc(), F.col("doc_id")))
        .alias("sparse_rank"),
    )
    dense = brute_force_topk(
        e, e.where(F.col("vec_id") == _RRF_QUERY_VEC), k=_RRF_DEPTH
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    fused = sparse.join(dense, "doc_id", "outer")
    rrf = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + sparse_rank)"), F.lit(0).cast("long")
    ) + F.coalesce(F.expr(f"1000000 div ({_RRF_K} + dense_rank)"), F.lit(0).cast("long"))
    return (
        fused.select("doc_id", "sparse_rank", "dense_rank", rrf.alias("rrf_ppm"))
        .orderBy(F.col("rrf_ppm").desc(), "doc_id")
        .limit(_RRF_CUT)
    )


_RERANK_DEPTH = 50
_RERANK_CUT = 10
_RERANK_QUERY_VEC = 0

_RERANK_COS = (
    "list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    "    * sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)


@demo(
    "q_retrieval_rerank",
    sql=_bm25_sql(_RERANK_DEPTH)
    + f"""
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT CAST({_RERANK_QUERY_VEC} AS BIGINT) AS query_id,
               c.vec_id AS neighbor_id,
               {_RERANK_COS} AS cosine_sim,
               row_number() OVER (ORDER BY {_RERANK_COS} DESC, c.vec_id ASC)
                   AS rank
        FROM bm25 b
        JOIN embeddings c ON c.vec_id = b.doc_id
        CROSS JOIN (SELECT embedding FROM embeddings
                    WHERE vec_id = {_RERANK_QUERY_VEC}) q
        WHERE c.vec_id <> {_RERANK_QUERY_VEC}
    )
    WHERE rank <= {_RERANK_CUT}
    """,
)
def q_retrieval_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve-then-rerank — the production search/RAG
    pipeline shape: a CHEAP sparse stage (BM25 top-50 over the seed
    query terms) bounds the candidate set, then an EXPENSIVE dense
    stage (exact cosine against the query embedding) reranks only
    those candidates to the final top-10. The rerank stage therefore
    scores 50 vectors regardless of corpus size — the structural
    reason two-stage ranking scales where full-corpus dense scoring
    would not; the stage-1 candidate semi-join keeps the corpus
    embedding table pruned to candidate rows before any vector math.
    Exact fold arithmetic on both engines (same cosine contract as
    q_sim_bruteforce_topk), so the driver hash pins the COMPOSITION:
    candidates, join alignment, rerank order, and cut."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    candidates = bm25_topk(d, _QUERY_TERMS, k=_RERANK_DEPTH).select("doc_id")
    cand_vecs = e.join(
        F.broadcast(candidates),
        e["vec_id"] == candidates["doc_id"],
        "left_semi",
    )
    return brute_force_topk(
        cand_vecs,
        e.where(F.col("vec_id") == _RERANK_QUERY_VEC),
        k=_RERANK_CUT,
    )
