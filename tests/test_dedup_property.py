"""Property test: blocked n-gram Jaccard operator equals a brute-force
Python reference on random word-bag corpora."""

from __future__ import annotations


from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.dedup import ngram_jaccard_pairs

VOCAB = ["scan", "join", "sort", "merge", "hash", "row", "key", "batch"]


def _py_shingles(text: str, k: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _py_pairs(docs, threshold):
    out = {}
    for i, (ida, ta) in enumerate(docs):
        sa = _py_shingles(ta)
        if not sa:
            continue
        for idb, tb in docs[i + 1 :]:
            sb = _py_shingles(tb)
            if not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                a, b = min(ida, idb), max(ida, idb)
                out[(a, b)] = j
    return out


corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_ngram_jaccard_matches_bruteforce(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_sim"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", block=F.lit(1), k=3, threshold=0.3
        ).collect()
    }
    want = _py_pairs(docs, 0.3)
    assert set(got) == set(want)
    for pair, j in want.items():
        assert abs(got[pair] - j) < 1e-12


def test_simhash_rotation_blocks_raise_recall(spark):
    """Charikar block-and-permute: the two-rotation candidate set is a
    superset of the single-prefix-block set, and every pair with
    hamming <= 1 (guaranteed: all diffs fall in one 16-bit half) is found."""
    from itertools import combinations

    from transit_efficiency_analysis_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    # word-bag corpus with heavy overlap so fingerprints cluster
    texts = [
        " ".join(VOCAB[:6]),
        " ".join(VOCAB[:6]) + " extra",
        " ".join(VOCAB[:5]),
        " ".join(VOCAB[2:8]),
        " ".join(reversed(VOCAB)),
        " ".join(VOCAB) + " tail tokens here",
        " ".join(VOCAB[3:]) + " scan scan",
        " ".join(VOCAB[1:7]),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hmax = 16
    single = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(df, "doc_id", "text", hmax, rotations=(0,)).collect()
    }
    double = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(df, "doc_id", "text", hmax, rotations=(0, 16)).collect()
    }
    assert double >= single

    # ground truth from the fingerprints themselves
    fps = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df, "doc_id", "text").collect()}
    truth_h1 = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 1
    }
    assert truth_h1 <= double


def test_dedup_clusters_chain_and_singletons(spark):
    """Connected components: a 5-node chain (worst-case diameter, forces
    multiple propagation rounds), a 2-clique, and singletons."""
    from transit_efficiency_analysis_spark.operators.dedup import dedup_clusters

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # chain 0-1-2-3-4 (edges given high-to-low so min must walk), clique 6-7
    pairs = spark.createDataFrame(
        [(3, 4), (2, 3), (1, 2), (0, 1), (6, 7)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in
           dedup_clusters(nodes, pairs).collect()}
    assert out == {
        0: (0, True), 1: (0, False), 2: (0, False), 3: (0, False), 4: (0, False),
        5: (5, True), 6: (6, True), 7: (6, False), 8: (8, True), 9: (9, True),
    }


@settings(max_examples=6, deadline=None)
@given(texts=corpus_strategy)
def test_cross_corpus_overlap_matches_bruteforce(spark, texts):
    """Contamination operator equals the per-pair shingle-set intersection
    computed in Python (corpus = even ids, benchmark = odd ids)."""
    from transit_efficiency_analysis_spark.operators.dedup import cross_corpus_overlap

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    corpus = [(i, t) for i, t in docs if i % 2 == 0]
    bench = [(i, t) for i, t in docs if i % 2 == 1]
    out = cross_corpus_overlap(
        df.where(F.col("doc_id") % 2 == 0),
        df.where(F.col("doc_id") % 2 == 1),
        k=3,
    ).collect()
    got = {(r["doc_id"], r["bench_id"]): (r["n_common"], r["frac_of_bench"]) for r in out}
    expected = {}
    for ci, ct in corpus:
        cs = _py_shingles(ct)
        for bi, bt in bench:
            bs = _py_shingles(bt)
            inter = len(cs & bs)
            if inter and bs:
                expected[(ci, bi)] = (inter, inter / len(bs))
    assert got == expected
