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


def _py_removal(docs: list[tuple[int, str]], k: int) -> dict[int, tuple]:
    kgrams: dict[int, list[str]] = {}
    words: dict[int, list[str]] = {}
    for doc_id, text in docs:
        w = text.split(" ")
        words[doc_id] = w
        kgrams[doc_id] = [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]
    seen_in: dict[str, set[int]] = {}
    for doc_id, kgs in kgrams.items():
        for g in kgs:
            seen_in.setdefault(g, set()).add(doc_id)
    out = {}
    for doc_id, kgs in kgrams.items():
        covered = set()
        for i, g in enumerate(kgs):
            owners = seen_in[g]
            if len(owners) >= 2 and doc_id != min(owners):
                covered.update(range(i, i + k))
        kept = [t for p, t in enumerate(words[doc_id]) if p not in covered]
        out[doc_id] = (
            len(words[doc_id]),
            len(words[doc_id]) - len(kept),
            " ".join(kept),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_span_removal_matches_bruteforce(spark, texts):
    from transit_efficiency_analysis_spark.operators.spans import (
        remove_duplicated_spans,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
        for r in remove_duplicated_spans(df, k=K).collect()
    }
    assert got == _py_removal(docs, K)


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=120),
    mod=st.integers(min_value=1, max_value=9),
    buckets=st.integers(min_value=1, max_value=12),
)
def test_running_total_property(spark, n, mod, buckets):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.budget import running_total

    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % mod).alias("score"),
        ((F.col("id") * 13) % 7 + 1).alias("wt"),
    )
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {
        r.id: r.cum
        for r in running_total(
            df, order, "wt", n_buckets=buckets, bucket_by=-F.col("score")
        ).collect()
    }
    ref_w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    ref = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("wt").over(ref_w).cast("long")).collect()
    }
    assert got == ref
