"""Distributed BPE (byte-pair-encoding) merge learning.

The classic tokenizer-training loop, Spark-first: BPE statistics live on
the WORD-TYPE table (distinct words weighted by corpus frequency), never
on the corpus itself — the standard trick that makes each merge round
O(vocabulary), not O(corpus). Per round:

1. pair counts: zip each word's symbol sequence with its own tail,
   explode, weighted groupBy — one shuffle over the word-type table;
2. best pair: deterministic argmax (count DESC, then lexicographic) —
   a ONE-ROW driver collect per round (bounded, like the sampleBy
   fraction reads in ``demo/corpusops.py``);
3. merge application: canonical greedy left-to-right pair merging as a
   pure string fold — ``aggregate`` over the symbol array with a
   ``'|'``-separated accumulator. The fold appends ``x`` without a
   separator exactly when the accumulator's LAST segment equals the
   merge's left symbol and ``x`` is its right symbol, which reproduces
   greedy BPE including the adjacent-repeat case (``abab`` under (a,b)
   -> ``ab|ab``) — verified char-for-char against DuckDB's
   ``list_reduce`` in the demo oracle and pytest.

Symbols are restricted to ``[A-Za-z0-9]`` (asserted) so literals can be
embedded in the fold expression without escaping; the segment check uses
``endswith(acc, '|' || left)`` — no LIKE patterns, no regex.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SYM = re.compile(r"^[A-Za-z0-9]+$")


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word-type table: (seg, freq) with ``seg`` the
    ``'|'``-separated character sequence of each distinct word."""
    w = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    return (
        w.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.array_join(F.split("w", ""), "|").alias("seg"), "freq")
    )


def _pair_counts(reps: DataFrame) -> DataFrame:
    return (
        reps.select(F.split("seg", "[|]").alias("s"), "freq")
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("s", 1, F.size("s") - 1),
                    F.slice("s", 2, F.size("s") - 1),
                )
            ).alias("p"),
            "freq",
        )
        .select(F.col("p.0").alias("left_sym"), F.col("p.1").alias("right_sym"), "freq")
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
    )


def apply_merge(reps: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right application of one merge to every word rep."""
    if not (_SYM.match(left) and _SYM.match(right)):
        raise ValueError("symbols must be [A-Za-z0-9]+")
    fold = f"""
      aggregate(slice(split(seg, '[|]'), 2, size(split(seg, '[|]')) - 1),
                element_at(split(seg, '[|]'), 1),
                (acc, x) -> CASE WHEN (acc = '{left}' OR endswith(acc, '|{left}'))
                                      AND x = '{right}'
                                 THEN concat(acc, x)
                                 ELSE concat(acc, '|', x) END)
    """
    return reps.select(F.expr(fold).alias("seg"), "freq")


def learn_merges(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[dict]:
    """Run ``n_merges`` BPE rounds; returns the learned merge table as
    ``[{merge_round, left_sym, right_sym, merged, pair_count}, ...]``.
    Each round's word-type table is cached (it is vocabulary-sized) so
    the pair count and the next round's fold share one materialization.
    """
    reps = word_types(docs, text_col).cache()
    merges: list[dict] = []
    for i in range(1, n_merges + 1):
        best = (
            _pair_counts(reps)
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .first()
        )
        if best is None:
            break
        merges.append(
            {
                "merge_round": i,
                "left_sym": best.left_sym,
                "right_sym": best.right_sym,
                "merged": best.left_sym + best.right_sym,
                "pair_count": best.pair_count,
            }
        )
        nxt = apply_merge(reps, best.left_sym, best.right_sym).cache()
        reps.unpersist()
        reps = nxt
    reps.unpersist()
    return merges
