"""Property test: duplicated-span detection equals a brute-force Python
reference (k-gram duplication + interval merge) on random word-bag
corpora — spans, boundaries, and start counts all exact."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from transit_efficiency_analysis_spark.operators.spans import duplicated_spans

VOCAB = ["scan", "join", "sort", "merge", "hash", "row", "key", "batch"]
K = 3  # small k so random corpora actually share k-grams


def _py_spans(docs: list[tuple[int, str]], k: int) -> set[tuple]:
    kgrams: dict[int, list[str]] = {}
    for doc_id, text in docs:
        w = text.split(" ")
        kgrams[doc_id] = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
    seen_in: dict[str, set[int]] = {}
    for doc_id, kgs in kgrams.items():
        for g in kgs:
            seen_in.setdefault(g, set()).add(doc_id)
    out = set()
    for doc_id, kgs in kgrams.items():
        hits = [i for i, g in enumerate(kgs) if len(seen_in[g]) >= 2]
        # merge [i, i+k-1] intervals
        spans: list[list[int]] = []  # [start, end, n_starts]
        for i in hits:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + k - 1)
                spans[-1][2] += 1
            else:
                spans.append([i, i + k - 1, 1])
        for s, e, n in spans:
            out.add((doc_id, s, e, e - s + 1, n))
    return out


corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=14).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_duplicated_spans_matches_bruteforce(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_starts)
        for r in duplicated_spans(df, k=K).collect()
    }
    assert got == _py_spans(docs, K)
