"""Text-analysis demos over ``documents`` (north-star operators; SURVEY §2.7
extension). Language-ID, quality scoring, token counting, fingerprinting —
all JVM-side column expressions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.functions.text import (
    LANG_STOPWORDS,
    stopword_hits,
    token_count_bpe_ish,
    token_count_ws,
    word_shingles,
    words,
)
from transit_efficiency_analysis_spark.sources.registry import load_table

_LANGS = sorted(LANG_STOPWORDS)  # deterministic tie-break order: de,en,es,fr,zh


def _sql_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter(w, x -> x IN ({lst})))"


@demo(
    "q_text_langid",
    sql=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN g = 0 THEN 'und'
                {" ".join(f"WHEN s_{lang} = g THEN '{lang}'" for lang in _LANGS)}
           END AS predicted_lang,
           CAST(g AS INTEGER) AS best_score
    FROM (
        SELECT doc_id, lang,
               {", ".join(f"{_sql_hits(lang)} AS s_{lang}" for lang in _LANGS)},
               greatest({", ".join(f"{_sql_hits(lang)}" for lang in _LANGS)}) AS g
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """language-ID: stopword-hit scoring per language, argmax with
    lexicographic tie-break, 'und' when no list hits at all."""
    d = load_table(spark, sf_dir, "documents")
    w = words("text")
    scores = {lang: stopword_hits(w, LANG_STOPWORDS[lang]) for lang in _LANGS}
    g = F.greatest(*scores.values())
    pred = F.when(g == 0, F.lit("und"))
    for lang in _LANGS:
        pred = pred.when(scores[lang] == g, F.lit(lang))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        g.cast("int").alias("best_score"),
    )


@demo(
    "q_text_quality",
    sql="""
    SELECT doc_id,
           n_words,
           n_chars,
           CAST(len(replace(text, ' ', '')) AS DOUBLE) / n_words AS avg_word_len,
           CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE) / n_words
               AS stopword_ratio,
           CAST(len(list_distinct(w)) AS DOUBLE) / n_words AS distinct_ratio,
           (n_words BETWEEN 20 AND 90
            AND CAST(len(list_distinct(w)) AS DOUBLE) / n_words > 0.2) AS passes_quality
    FROM (
        SELECT doc_id, text, n_chars, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n_words
        FROM documents
    )
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality scoring: length, mean word length, stopword ratio,
    lexical diversity, and a composite gate — the C4/Gopher-style filter
    family as pure column math."""
    d = load_table(spark, sf_dir, "documents")
    w = words("text")
    n_words = F.size(w)
    avg_word_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_words
    stop_ratio = stopword_hits(w, ["the", "a"]).cast("double") / n_words
    distinct_ratio = F.size(F.array_distinct(w)).cast("double") / n_words
    return d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.col("n_chars"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        (n_words.between(20, 90) & (distinct_ratio > 0.2)).alias("passes_quality"),
    )


@demo(
    "q_text_tokens",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]')) AS INTEGER)
               AS n_tokens_bpe_ish,
           CAST(ceil(len(text) / 4.0) AS INTEGER) AS n_tokens_char_estimate
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token counting: whitespace, BPE-ish regex, and the chars/4 estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_ws("text").alias("n_tokens_ws"),
        F.regexp_count(F.col("text"), F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9 ]")).alias(
            "n_tokens_bpe_ish"
        ),
        F.ceil(F.length("text") / 4.0).cast("int").alias("n_tokens_char_estimate"),
    )


@demo(
    "q_text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(text) AS content_hash,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS bag_hash,
           (SELECT min(md5(array_to_string(w[i:i+2], ' ')))
            FROM unnest(generate_series(1, greatest(len(w) - 2, 0))) AS t(i))
               AS min_shingle_hash
    FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """document fingerprinting: exact content hash, order-insensitive
    bag-of-words hash, and the min-shingle-hash (winnowing/MinHash-1)."""
    d = load_table(spark, sf_dir, "documents")
    w = words("text")
    bag = F.md5(F.array_join(F.array_sort(F.array_distinct(w)), " "))
    min_shingle = F.array_min(F.transform(word_shingles(w, 3), F.md5))
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        bag.alias("bag_hash"),
        min_shingle.alias("min_shingle_hash"),
    )


_VOCAB_K = 32


@demo(
    "q_text_vocab_coverage",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM freq ORDER BY c DESC, tok ASC LIMIT {_VOCAB_K})
    SELECT t.source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(1000000 * CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                               AS BIGINT) // count(*) AS BIGINT) AS oov_ppm
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.source
    """,
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction + out-of-vocabulary rate (the tokenizer-
    pipeline coverage metric: how much of each source a fixed top-K
    vocabulary explains). Three bounded stages: token frequency (one
    groupBy with map-side partial agg), top-K vocab selection
    (TakeOrderedAndProject — per-partition heaps, deterministic
    count-then-token tiebreak), and a BROADCAST membership join back
    onto the token stream (the vocab is K rows by construction, so the
    big side never shuffles for the join; the only data-proportional
    shuffles are the two aggregates). OOV share is exact integer ppm —
    bit-portable, no float division."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        freq.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    ).select(
        "source",
        "n_tokens",
        "n_oov",
        F.expr("CAST(1000000 * n_oov div n_tokens AS BIGINT)").alias("oov_ppm"),
    )


_BPE_ROUNDS = 3


def _bpe_round_sql(prev_rep: str, i: int) -> str:
    """One unrolled BPE round: deterministic best-pair selection + the
    greedy merge fold (mirrors ``operators/bpe.py`` symbol for symbol)."""
    return f"""
    p{i} AS (
        SELECT s[i] AS left_sym, s[i+1] AS right_sym,
               CAST(sum(freq) AS BIGINT) AS pair_count
        FROM (SELECT string_split(seg, '|') AS s, freq FROM {prev_rep}),
             LATERAL unnest(generate_series(1, len(s) - 1)) AS t(i)
        GROUP BY 1, 2
        ORDER BY pair_count DESC, left_sym, right_sym
        LIMIT 1
    ),
    r{i} AS (
        SELECT list_reduce(string_split(seg, '|'),
                   (acc, x) -> CASE WHEN (acc = p.left_sym
                                          OR ends_with(acc, '|' || p.left_sym))
                                         AND x = p.right_sym
                                    THEN acc || x ELSE acc || '|' || x END) AS seg,
               freq
        FROM {prev_rep}, p{i} p
    )"""


_BPE_SQL = f"""
    WITH words AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0
        GROUP BY w
    ),
    r0 AS (
        SELECT array_to_string(regexp_split_to_array(w, ''), '|') AS seg, freq
        FROM words
    ),
    {_bpe_round_sql('r0', 1)},
    {_bpe_round_sql('r1', 2)},
    {_bpe_round_sql('r2', 3)}
    SELECT * FROM (
        SELECT 1 AS merge_round, left_sym, right_sym,
               left_sym || right_sym AS merged, pair_count FROM p1
        UNION ALL
        SELECT 2, left_sym, right_sym, left_sym || right_sym, pair_count FROM p2
        UNION ALL
        SELECT 3, left_sym, right_sym, left_sym || right_sym, pair_count FROM p3
    )
"""


@demo("q_text_bpe_merges", sql=_BPE_SQL)
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer merge learning (3 rounds) over the corpus: each
    round counts symbol pairs on the VOCABULARY-sized word-type table
    (one shuffle per round, O(word types) not O(corpus)), picks the
    deterministic argmax pair, and applies it with the canonical greedy
    left-to-right string fold (``operators/bpe.py``). The oracle unrolls
    the identical three rounds with DuckDB ``list_reduce`` — two engines
    running the same tokenizer-training algebra must learn the same
    merge table, counts and all."""
    from transit_efficiency_analysis_spark.operators.bpe import learn_merges

    d = load_table(spark, sf_dir, "documents")
    merges = learn_merges(d, _BPE_ROUNDS)
    return spark.createDataFrame(
        [
            (m["merge_round"], m["left_sym"], m["right_sym"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "merge_round int, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


@demo(
    "q_text_collocations",
    sql="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bigrams AS (
        SELECT unnest([w[i] || ' ' || w[i+1]
                       FOR i IN generate_series(1, greatest(len(w) - 1, 0))]) AS bg
        FROM toks
    ),
    bg_counts AS (
        SELECT bg, count(*) AS c_xy FROM bigrams GROUP BY bg HAVING count(*) >= 10
    ),
    unigrams AS (
        SELECT unnest(w) AS t FROM toks
    ),
    uni AS (
        SELECT t, count(*) AS c FROM unigrams WHERE t <> '' GROUP BY t
    ),
    totals AS (SELECT count(*) AS n FROM unigrams WHERE t <> ''),
    lifted AS (
        SELECT b.bg, b.c_xy, ux.c AS c_x, uy.c AS c_y,
               (b.c_xy * n // (ux.c * uy.c)) * 1000000
                   + ((b.c_xy * n % (ux.c * uy.c)) * 1000000) // (ux.c * uy.c)
                   AS lift_ppm
        FROM bg_counts b
        JOIN uni ux ON ux.t = string_split(b.bg, ' ')[1]
        JOIN uni uy ON uy.t = string_split(b.bg, ' ')[2]
        CROSS JOIN totals
    )
    SELECT bg AS bigram, c_xy, c_x, c_y, CAST(lift_ppm AS BIGINT) AS lift_ppm
    FROM lifted
    ORDER BY lift_ppm DESC, bigram ASC LIMIT 20
    """,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by PMI-style lift
    ``P(xy)/(P(x)·P(y)) = c_xy·N/(c_x·c_y)`` in exact ppm integers
    (monotone in PMI, so the ranking is identical without a float log).
    The shape is the corpus-statistics pass every tokenizer/phrase-table
    build runs at 100 TB: bigram and unigram counts partial-aggregate
    map-side, the ``c_xy >= 10`` support floor prunes the long tail
    BEFORE the two token-keyed joins, the corpus total rides in as a
    1-row broadcast, and top-20 is TakeOrderedAndProject — no global
    sort. ppm_div envelope: c_xy·N < 9.2e18 holds to ~10^9-token corpora
    per ppm_div's documented bound; beyond that the same formula runs in
    DECIMAL(38,0)."""
    from transit_efficiency_analysis_spark.operators.retrieval import ppm_div

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(words("text").alias("w"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("w") < 2, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1)),
                )
            )
        ).alias("bg")
    )
    bg_counts = (
        bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy")).where(F.col("c_xy") >= 10)
    )
    unigrams = toks.select(F.explode("w").alias("t")).where(F.col("t") != "")
    uni = unigrams.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = unigrams.groupBy().agg(F.count(F.lit(1)).alias("n"))
    split_bg = F.split(F.col("bg"), " ")
    withx = bg_counts.withColumn("tx", F.element_at(split_bg, 1)).withColumn(
        "ty", F.element_at(split_bg, 2)
    )
    ux = uni.select(F.col("t").alias("tx"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("t").alias("ty"), F.col("c").alias("c_y"))
    lifted = (
        withx.join(ux, "tx")
        .join(uy, "ty")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("bg").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            ppm_div(F.col("c_xy") * F.col("n"), F.col("c_x") * F.col("c_y")).alias(
                "lift_ppm"
            ),
        )
    )
    return lifted.orderBy(F.col("lift_ppm").desc(), F.col("bigram").asc()).limit(20)


def _bpe_encode_round_sql(rep: str, i: int) -> str:
    return f"""
        SELECT {i} AS merge_round,
               CAST(sum(freq * len(string_split(seg, '|'))) AS BIGINT)
                   AS corpus_symbols,
               count(*) AS n_word_types
        FROM {rep}"""


_BPE_ENCODE_SQL = f"""
    WITH words AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) > 0
        GROUP BY w
    ),
    r0 AS (
        SELECT array_to_string(regexp_split_to_array(w, ''), '|') AS seg, freq
        FROM words
    ),
    {_bpe_round_sql('r0', 1)},
    {_bpe_round_sql('r1', 2)},
    {_bpe_round_sql('r2', 3)}
    {_bpe_encode_round_sql('r0', 0)}
    UNION ALL {_bpe_encode_round_sql('r1', 1)}
    UNION ALL {_bpe_encode_round_sql('r2', 2)}
    UNION ALL {_bpe_encode_round_sql('r3', 3)}
"""


@demo("q_text_bpe_encode", sql=_BPE_ENCODE_SQL)
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the other half of the tokenizer loop: apply the
    learned merge table to the corpus and measure what tokenization
    actually buys, per round. Encoding stays on the word-type table
    (apply each merge once per distinct word, weight by frequency), so
    the per-round cost is O(vocabulary) with the corpus total recovered
    as Σ freq·symbols — the same trick that makes learning distributed.
    Output: (merge_round, corpus_symbols, n_word_types) for rounds 0-3;
    corpus_symbols is monotonically non-increasing (each merge can only
    shrink sequences), which tests/test_bpe.py asserts independently.
    The oracle re-learns AND re-applies the merges via the unrolled
    DuckDB CTE chain — both engines run the full learn→encode loop."""
    from transit_efficiency_analysis_spark.operators.bpe import (
        apply_merge,
        learn_merges,
        word_types,
    )

    d = load_table(spark, sf_dir, "documents")
    merges = learn_merges(d, _BPE_ROUNDS)
    reps = word_types(d)
    stages = [reps]
    for m in merges:
        stages.append(apply_merge(stages[-1], m["left_sym"], m["right_sym"]))
    summaries = []
    for i, rep in enumerate(stages):
        summaries.append(
            rep.groupBy().agg(
                F.lit(i).alias("merge_round"),
                F.sum(
                    F.col("freq") * F.size(F.split("seg", "[|]"))
                ).alias("corpus_symbols"),
                F.count(F.lit(1)).alias("n_word_types"),
            ).select("merge_round", "corpus_symbols", "n_word_types")
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out


@demo(
    "q_text_lm_score",
    sql="""
    WITH arrs AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        FROM documents
    ),
    trans AS (
        SELECT doc_id, a[i] AS prev, a[i + 1] AS cur
        FROM arrs, LATERAL unnest(generate_series(1, len(a) - 1)) AS g(i)
        WHERE len(a) >= 2
    ),
    bc AS (SELECT prev, cur, count(*) AS cb FROM trans GROUP BY prev, cur),
    pc AS (SELECT prev, count(*) AS cp FROM trans GROUP BY prev),
    scored AS (
        SELECT t.doc_id, (b.cb * 1000000) // p.cp AS p_ppm
        FROM trans t
        JOIN bc b ON b.prev = t.prev AND b.cur = t.cur
        JOIN pc p ON p.prev = t.prev
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trans,
           CAST(CAST(sum(p_ppm) AS BIGINT) // count(*) AS BIGINT) AS score_ppm
    FROM scored GROUP BY doc_id
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language-model quality scoring: train a bigram LM on the
    corpus itself (transition counts), then score every document by its
    mean transition probability — low scores flag machine-mangled or
    out-of-distribution text, the classic LM-based quality gate in
    training-data pipelines. Kept EXACT end-to-end: each transition's
    probability is an integer ppm (``C(prev,cur)·1e6 div C(prev·)``)
    and the doc score is the integer mean, so the driver hash is
    bit-deterministic — the arithmetic-mean variant of the usual
    log-domain perplexity (``ln`` differs in the last ulp between
    engines — probed: ln(3) disagrees — so the log form can only be
    tolerance-checked; the production path rounds log-probs instead).
    Plan: bigram extraction is a pure map (array fold over the split —
    no window, no self-join); the two count tables shuffle on bigram /
    prefix keys; the score join is vocabulary-sized, broadcast back
    onto the transitions."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.filter(F.split("text", " "), lambda x: x != "")
    docs = d.select("doc_id", arr.alias("a")).where(F.size("a") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("a") - 1),
        lambda i: F.struct(
            F.element_at("a", i).alias("prev"),
            F.element_at("a", i + 1).alias("cur"),
        ),
    )
    trans = docs.select("doc_id", F.explode(pairs).alias("t")).select(
        "doc_id", F.col("t.prev").alias("prev"), F.col("t.cur").alias("cur")
    )
    bc = trans.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    pc = trans.groupBy("prev").agg(F.count(F.lit(1)).alias("cp"))
    scored = (
        trans.join(F.broadcast(bc), ["prev", "cur"])
        .join(F.broadcast(pc), ["prev"])
        .select(
            "doc_id",
            F.expr("cb * 1000000 div cp").alias("p_ppm"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.expr("sum(p_ppm) div count(*)").cast("long").alias("score_ppm"),
    )


@demo(
    "q_text_regex_extract",
    sql="""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, 'ta[a-z]+'),
                                    ','), '') AS matches_csv,
           CAST(coalesce(len(regexp_extract_all(text, 'ta[a-z]+')), 0)
                AS BIGINT) AS n_matches,
           coalesce(regexp_extract(text, 'ta[a-z]+'), '') AS first_match
    FROM documents
    """,
)
def q_text_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction surface — ``regexp_extract_all`` (all matches,
    the pattern-mining / PII-sweep primitive), match count, and first
    match, per document. The pattern sticks to syntax with identical
    semantics in Java regex (Spark) and RE2 (DuckDB) — simple greedy
    character classes; the demos avoid constructs the engines disagree
    on (lookaround, possessives — Java-only; leftmost-longest vs
    leftmost-first only differs under alternation). Map-side only."""
    d = load_table(spark, sf_dir, "documents")
    pat = "ta[a-z]+"
    return d.select(
        "doc_id",
        F.array_join(F.regexp_extract_all("text", F.lit(pat), 0), ",").alias(
            "matches_csv"
        ),
        F.size(F.regexp_extract_all("text", F.lit(pat), 0))
        .cast("long")
        .alias("n_matches"),
        F.regexp_extract("text", pat, 0).alias("first_match"),
    )
