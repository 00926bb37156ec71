"""BPE merge-learning contracts: the distributed fold must equal a
pure-Python canonical greedy BPE reference on a hand corpus, including
the adjacent-repeat merge case and deterministic tie-breaks."""

from __future__ import annotations

from transit_efficiency_analysis_spark.operators.bpe import apply_merge, learn_merges


def _ref_learn(words: dict[str, int], n: int):
    reps = [(list(w), f) for w, f in sorted(words.items())]
    merges = []
    for rnd in range(1, n + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in reps:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        a, b = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((rnd, a, b, a + b, counts[(a, b)]))
        new_reps = []
        for syms, f in reps:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_reps.append((out, f))
        reps = new_reps
    return merges


def test_learn_matches_python_reference(spark):
    corpus = ["abab cat cab", "abba cat ab", "bat cab ab ab"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    words: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    got = [
        (m["merge_round"], m["left_sym"], m["right_sym"], m["merged"], m["pair_count"])
        for m in learn_merges(docs, 4)
    ]
    assert got == _ref_learn(words, 4)


def test_greedy_fold_handles_adjacent_repeats(spark):
    reps = spark.createDataFrame(
        [("a|b|a|b", 1), ("a|a|b", 1), ("a|b|b|a", 1)], "seg string, freq long"
    )
    got = sorted(r.seg for r in apply_merge(reps, "a", "b").collect())
    assert got == sorted(["a|ab", "ab|ab", "ab|b|a"])


def test_encode_compression_is_monotone(spark, sf_dir):
    """Each merge can only shrink symbol sequences, so corpus_symbols is
    non-increasing per round while word-type count is constant; round 0
    equals total character count of all corpus words."""
    from transit_efficiency_analysis_spark.demo import load_registry
    from transit_efficiency_analysis_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    rows = sorted(
        (r.merge_round, r.corpus_symbols, r.n_word_types)
        for r in load_registry()["q_text_bpe_encode"].fn(spark, sf_dir).collect()
    )
    assert [r[0] for r in rows] == [0, 1, 2, 3]
    syms = [r[1] for r in rows]
    assert all(a >= b for a, b in zip(syms, syms[1:]))
    assert syms[0] > syms[3], "three merges must compress a text corpus"
    assert len({r[2] for r in rows}) == 1, "merges never change word-type count"
    total_chars = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert syms[0] == total_chars
