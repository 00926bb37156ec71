"""Parity tests for lexical retrieval (BM25, TF-IDF)."""

from __future__ import annotations

from collections import Counter

from transit_efficiency_analysis_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
)

_M = 1_000_000

CORPUS = [
    (1, "the transit bus arrives late in heavy snow"),
    (2, "the train departs on time every morning"),
    (3, "bus delay analysis during snow and rain events"),
    (4, "weather impact on bus and train punctuality"),
    (5, "snow snow snow everywhere on the bus route"),
    (6, "a quiet unrelated document about cooking pasta"),
]


def _ppm(num: int, den: int) -> int:
    return (num // den) * _M + ((num % den) * _M) // den


def _py_bm25(query: list[str]) -> dict[int, int]:
    docs = {i: t.split() for i, t in CORPUS}
    n = len(docs)
    total = sum(len(t) for t in docs.values())
    df = Counter()
    for toks in docs.values():
        for term in set(toks):
            if term in query:
                df[term] += 1
    scores: dict[int, int] = {}
    for i, toks in docs.items():
        tf = Counter(t for t in toks if t in query)
        s = 0
        for term, f in tf.items():
            num = (2 * n - 2 * df[term] + 1) * 22 * f * total
            den = (2 * df[term] + 1) * (
                10 * total * f + 3 * total + 9 * len(toks) * n
            )
            s += _ppm(num, den)
        if tf:
            scores[i] = s
    return scores


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    query = ["bus", "snow"]
    out = {
        r["doc_id"]: (r["n_terms_hit"], r["bm25_ppm"])
        for r in bm25_topk(df, query, k=10).collect()
    }
    ref = _py_bm25(query)
    assert set(out) == set(ref)
    for doc_id, score in ref.items():
        assert out[doc_id][1] == score, doc_id
    # doc 5 repeats 'snow' 4x but tf saturates: it must NOT dominate purely
    # by count — its score is bounded by the k1 saturation.
    assert out[5][0] == 2  # hits both terms (snow + bus)


def test_bm25_k_limit_and_tiebreak(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    top2 = bm25_topk(df, ["bus", "snow"], k=2).collect()
    allr = sorted(
        bm25_topk(df, ["bus", "snow"], k=10).collect(),
        key=lambda r: (-r["bm25_ppm"], r["doc_id"]),
    )
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in allr[:2]]


def test_bm25_log_idf_same_ordering_on_rare_terms(spark):
    # For df < N/2 both idfs are positive and monotone-decreasing in df, so
    # the top-k ordering agrees. (For df > N/2 the log idf goes NEGATIVE
    # while the rational idf stays positive — orderings legitimately
    # diverge there; that regime is exercised in the reference test above.)
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    query = ["train", "pasta", "delay"]
    rational = [r["doc_id"] for r in bm25_topk(df, query, k=10).collect()]
    logv = [
        r["doc_id"] for r in bm25_topk(df, query, k=10, idf="log").collect()
    ]
    assert rational == logv


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = tfidf_top_terms(df, top_n=2).collect()
    by_doc: dict[int, list[str]] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["term_rank"])):
        by_doc.setdefault(r["doc_id"], []).append(r["term"])
        assert r["tfidf_ppm"] > 0
    # every doc has ranked terms, none exceeds top_n
    assert set(by_doc) == {i for i, _ in CORPUS}
    assert all(len(v) <= 2 for v in by_doc.values())
    # doc 6's terms all tie (every term df=1, tf=1) → alphabetical tie-break
    assert by_doc[6] == ["a", "about"]
    # corpus-ubiquitous terms (df > half the docs) are dropped: 'the' (4/6)
    assert all("the" not in v for v in by_doc.values())


def test_tfidf_reference_values(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = {
        (r["doc_id"], r["term"]): r["tfidf_ppm"]
        for r in tfidf_top_terms(df, top_n=2).collect()
    }
    docs = {i: t.split() for i, t in CORPUS}
    n = len(docs)
    dfreq = Counter()
    for toks in docs.values():
        for term in set(toks):
            dfreq[term] += 1
    for (doc_id, term), got in out.items():
        tf = docs[doc_id].count(term)
        expect = (tf * n * _M) // (len(docs[doc_id]) * dfreq[term])
        assert got == expect, (doc_id, term)


def test_rrf_fusion_consistency(spark, sf_dir):
    """RRF output must be a subset of the two source lists' union, scores
    must equal the rank formula exactly, and a doc on both lists must
    beat a same-rank doc on one list."""
    from transit_efficiency_analysis_spark.demo import load_registry
    from transit_efficiency_analysis_spark.demo.retrieval import (
        _RRF_DEPTH,
        _RRF_K,
    )

    rows = load_registry()["q_retrieval_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["sparse_rank"] is not None or r["dense_rank"] is not None
        expect = 0
        for rank in (r["sparse_rank"], r["dense_rank"]):
            if rank is not None:
                assert 1 <= rank <= _RRF_DEPTH
                expect += 1_000_000 // (_RRF_K + rank)
        assert r["rrf_ppm"] == expect
    # sorted by fused score descending with doc_id tiebreak
    scores = [(-r["rrf_ppm"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)


def test_ppm_div_exact_across_magnitudes(spark):
    """ppm_div must equal exact integer floor(num*1e6/den) over its whole
    documented envelope — den < 9.2e12 AND num/den < 9.2e12 (the result
    must fit int64) — one DataFrame of deterministic pseudo-random pairs,
    compared to Python bigint math."""
    import random

    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.retrieval import ppm_div

    rng = random.Random(20260813)
    pairs = []
    for _ in range(300):
        den = rng.randrange(1, 9_200_000_000_000)
        num = rng.randrange(0, min(9_200_000_000_000_000_000, den * 9_200_000_000_000))
        pairs.append((num, den))
    # corner cases: zero numerator, num == den, ratio at the envelope edge
    pairs += [(0, 5), (7, 7), (9_199_999_999_999, 1),
              (9_199_999_999_999_999_999, 9_199_999_999_999)]
    df = spark.createDataFrame(pairs, "num long, den long")
    got = {
        (r["num"], r["den"]): r["ppm"]
        for r in df.select("num", "den", ppm_div(F.col("num"), F.col("den")).alias("ppm")).collect()
    }
    for num, den in pairs:
        assert got[(num, den)] == (num * 1_000_000) // den, (num, den)
