"""Text-analysis column expressions for LLM-data-pipeline operators.

All pure JVM-side expressions (split / higher-order array functions / md5 /
regexp) — no Python in the hot path. These back the dedup (MinHash, SimHash,
Jaccard), language-ID, quality-scoring, token-counting and fingerprinting
operators (BASELINE.json north star; not present in the reference repo).

Hash convention: **md5 hex strings** everywhere a uniform hash is needed
(MinHash order statistics, SimHash bit draws). md5 is identical across
engines, so every derived value is exactly reproducible in the ANSI-SQL
oracles — unlike Spark's murmur3 ``hash()``. Lexicographic MIN over hex
strings is a valid uniform order statistic (the hex alphabet is ordered).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(_c(text), r"\s+")


def word_shingles(words_col: Column, k: int = 3) -> Column:
    """Word k-grams ('shingles') of a token array, space-joined.

    Empty array when the document has fewer than ``k`` tokens.
    """
    w = words_col
    n_shingles = F.greatest(F.size(w) - F.lit(k - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n_shingles)
    return F.when(n_shingles == 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(w, i, k), " "))
    )


def minhash_band(shingles_col: Column, band: int) -> Column:
    """MinHash order statistic for one band: min(md5(band || '|' || shingle)).

    Prefixing the band index re-keys the hash family per band (independent
    permutations). NULL for shingle-less documents.
    """
    hashed = F.transform(
        shingles_col, lambda s: F.md5(F.concat(F.lit(f"{band}|"), s))
    )
    return F.array_min(hashed)


def simhash32(tokens_col: Column) -> Column:
    """32-bit SimHash of a token multiset as a BIGINT.

    Bit j of each token's hash is drawn from hex digit j of md5(token)
    (top bit of the nibble: digit in 8..f → 1). Token votes are summed per
    bit position; the fingerprint bit is 1 when the vote sum is positive.
    Pure array algebra — aggregate over a 32-slot vote vector.
    """
    # lowercase hex: digit >= '8' ⇔ top nibble bit set
    votes = _simhash_votes(F.transform(tokens_col, F.md5))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        # 2^j via pow (exact in double up to 2^53); shiftleft needs a literal
        lambda j: F.when(
            F.element_at(votes, j + 1) > 0, F.pow(F.lit(2.0), j).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of a token multiset as a BIGINT (two's-complement:
    bit 63 carries weight −2^63).

    ONE md5 per token: bit j draws from the top bit of hex digit j for
    j < 32 (digit >= '8') and from the second bit of digit j-32 for
    j >= 32 (digit in 4-7 or c-f) — two independent uniform bit families
    from the same hash. Fingerprint bit j is set when the vote sum is
    positive. Same math as ``operators.dedup.simhash_fingerprints`` —
    this is the pure array-algebra form for single-column use.
    """
    hashes = F.transform(tokens_col, F.md5)
    votes0 = _simhash_votes(hashes)
    votes1 = _simhash_votes_bit2(hashes)
    votes = F.concat(votes0, votes1)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.when(
            F.element_at(votes, j + 1) > 0,
            # 2^j for j<63 (exact in double), −2^63 for the sign bit
            F.when(j < 63, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(-(2**63)).cast("long")
            ),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b)


def _simhash_votes(hashes: Column) -> Column:
    """32-slot ±1 vote vector from an array of md5 hex strings (top bit
    of each nibble: digit >= '8')."""
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda j: F.when(h.substr(j, F.lit(1)) >= "8", F.lit(1)).otherwise(F.lit(-1)),
            ),
            lambda a, b: a + b,
        ),
    )


def _simhash_votes_bit2(hashes: Column) -> Column:
    """32-slot ±1 vote vector from nibble bit 2 (digit in 4-7 or c-f) —
    independent of the top-bit family over the same md5."""
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda j: F.when(
                    h.substr(j, F.lit(1)).isin("4", "5", "6", "7", "c", "d", "e", "f"),
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            ),
            lambda a, b: a + b,
        ),
    )


def stopword_hits(words_col: Column, stopwords: list[str]) -> Column:
    """Count of tokens that appear in ``stopwords``."""
    return F.size(F.filter(words_col, lambda x: x.isin(*stopwords)))


#: tiny per-language stopword lists for the n-gram/stopword language-ID heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "y", "que", "los"],
    "fr": ["le", "la", "de", "et", "les", "des"],
    "de": ["der", "die", "das", "und", "ist", "von"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai"],
}


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe_ish(text: Column | str) -> Column:
    """BPE-ish token count: alnum runs and single non-alnum-non-space chars
    each count as one token (a cheap proxy for subword tokenizers)."""
    return F.regexp_count(_c(text), F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))
