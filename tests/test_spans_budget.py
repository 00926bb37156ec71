"""Duplicated-span detection/removal and distributed budget selection.

Crafted micro-corpora pin exact span boundaries (a shared L-token run
must come back as ONE span of exactly L tokens), keep-first removal
semantics, and novelty ratios; the budget operator is checked against
the naive single-window reference and its plan is asserted to range-
partition instead of collapsing to one task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.budget import running_total
from transit_efficiency_analysis_spark.operators.spans import (
    duplicated_spans,
    novelty_scores,
    remove_duplicated_spans,
)

RUN = "r1 r2 r3 r4 r5 r6 r7"  # 7-token run shared by docs 0 and 1


def _corpus(spark):
    rows = [
        (0, f"x1 x2 {RUN} x3"),        # run at positions 2..8
        (1, f"y1 {RUN} y2 y3"),        # run at positions 1..7
        (2, "z1 z2 z3 z4 z5 z6 z7 z8"),  # unique, no dup k-grams
        (3, "s1 s2 s3"),               # shorter than k: no k-grams at all
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_merges_to_one_exact_span(spark):
    spans = duplicated_spans(_corpus(spark), k=5).collect()
    by_doc = {r.doc_id: r for r in spans}
    assert set(by_doc) == {0, 1}
    # A 7-token run at k=5 yields 3 overlapping dup 5-grams that must
    # merge back into ONE span of exactly 7 tokens.
    assert (by_doc[0].span_start, by_doc[0].span_end) == (2, 8)
    assert (by_doc[1].span_start, by_doc[1].span_end) == (1, 7)
    assert by_doc[0].span_tokens == 7 and by_doc[1].span_tokens == 7
    assert by_doc[0].n_dup_starts == 3 and by_doc[1].n_dup_starts == 3


def test_two_nearby_runs_merge_when_overlapping_covers(spark):
    # doc 10 and 11 share two 5-gram runs whose covered intervals abut:
    # starts at pos 0 and pos 4 -> intervals [0,4] and [4,8] merge.
    a = "c1 c2 c3 c4 c5 d1 d2 d3 d4 e9"
    rows = [
        (10, a),
        (11, "q1 c1 c2 c3 c4 c5 q2 q3 q4 q5"),   # shares 5-gram at 10's pos 0
        (12, "w1 c5 d1 d2 d3 d4 w2 w3 w4 w5"),   # shares 5-gram at 10's pos 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {r.doc_id: r for r in duplicated_spans(df, k=5).collect()}
    assert (spans[10].span_start, spans[10].span_end) == (0, 8)
    assert spans[10].n_dup_starts == 2


def test_removal_keeps_canonical_and_strips_the_rest(spark):
    out = {r.doc_id: r for r in remove_duplicated_spans(_corpus(spark), k=5).collect()}
    assert set(out) == {0, 1, 2, 3}
    # doc 0 is canonical (min doc_id) for every shared 5-gram: untouched.
    assert out[0].n_removed == 0
    assert out[0].text_clean == f"x1 x2 {RUN} x3"
    # doc 1 loses exactly the 7 covered tokens, order preserved.
    assert out[1].n_removed == 7
    assert out[1].text_clean == "y1 y2 y3"
    # unique and too-short docs pass through whole.
    assert out[2].n_removed == 0 and out[2].text_clean.startswith("z1")
    assert out[3].n_removed == 0 and out[3].text_clean == "s1 s2 s3"


def test_fully_duplicated_doc_rewrites_to_empty(spark):
    rows = [(0, RUN), (1, RUN)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, k=5).collect()}
    assert out[0].text_clean == RUN and out[0].n_removed == 0
    assert out[1].text_clean == "" and out[1].n_removed == 7


def test_novelty_ratio(spark):
    nov = {r.doc_id: r for r in novelty_scores(_corpus(spark), k=5).collect()}
    # doc 0 has 10 tokens -> 6 5-grams, 3 duplicated -> novelty 0.5.
    assert set(nov) == {0, 1, 2}  # doc 3 (<5 tokens) excluded
    assert nov[0].n_kgrams == 6 and nov[0].n_dup == 3
    assert abs(nov[0].novelty - 0.5) < 1e-12
    assert nov[2].n_dup == 0 and nov[2].novelty == 1.0


def test_running_total_matches_single_window_reference(spark):
    # Deterministic pseudo-random weights; duplicate scores force the
    # tiebreaker to matter.
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 7).alias("score"),
        ((F.col("id") * 37) % 11 + 1).alias("wt"),
    )
    order = [F.col("score").desc(), F.col("id").asc()]
    got = {
        r.id: r.cum
        for r in running_total(
            df, order, "wt", n_buckets=8, bucket_by=-F.col("score")
        ).collect()
    }
    ref_w = (
        Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = {
        r.id: r.cum
        for r in df.withColumn(
            "cum", F.sum("wt").over(ref_w).cast("long")
        ).collect()
    }
    assert got == ref


def test_running_total_plan_range_partitions_not_single_task(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("wt")
    )
    plan = running_total(
        df, [F.col("id").asc()], "wt", n_buckets=8, bucket_by=F.col("id")
    )._jdf.queryExecution().executedPlan().toString()
    # The data-proportional window must be partitioned by the
    # deterministic literal-boundary bucket (a naive global cumsum would
    # show a Window with an empty partition spec over the full relation;
    # the pre-r10 form coupled correctness to a sampled range exchange
    # via spark_partition_id — ADVICE r9).
    assert "_pid" in plan
    assert "spark_partition_id" not in plan.lower()
    assert "hashpartitioning(_pid" in plan.lower()


def test_incremental_equals_full_restricted_to_batch(spark, sf_dir):
    # The ingest-maintenance invariant: incremental(corpus, batch) must
    # equal the full recompute over corpus ∪ batch, restricted to batch
    # docs ("some other doc has it" == "corpus has it or another batch
    # doc has it").
    from transit_efficiency_analysis_spark.operators.spans import (
        duplicated_spans_incremental,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    inc = set(
        map(tuple, duplicated_spans_incremental(corpus, batch, k=5).collect())
    )
    full = set(
        map(
            tuple,
            duplicated_spans(d, k=5)
            .where(F.col("doc_id") % 10 == 0)
            .collect(),
        )
    )
    assert inc == full and inc


def test_incremental_empty_corpus_equals_full_on_batch(spark):
    from transit_efficiency_analysis_spark.operators.spans import (
        duplicated_spans_incremental,
    )

    batch = _corpus(spark)
    empty = batch.where(F.lit(False))
    inc = set(
        map(tuple, duplicated_spans_incremental(empty, batch, k=5).collect())
    )
    full = set(map(tuple, duplicated_spans(batch, k=5).collect()))
    assert inc == full


def test_domain_affinity_separates_domains(spark):
    from transit_efficiency_analysis_spark.operators.affinity import (
        domain_affinity_scores,
    )

    # Two disjoint vocabularies: target docs (sports) vs raw (finance).
    rows = [
        (0, "goal match team win league cup", "t"),
        (1, "team goal cup league match win", "t"),
        (2, "stock bond yield market price fund", "r"),
        (3, "bond market fund stock yield price", "r"),
        (4, "goal match team cup win league", "r"),  # sports text in raw
        (5, "x", "r"),                               # <2 tokens: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        r.doc_id: r
        for r in domain_affinity_scores(df, F.col("src") == "t").collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    # Sports-vocabulary docs must outscore finance docs regardless of
    # their own domain label — the classifier scores content, not label.
    sports = {out[i].affinity_ppm for i in (0, 1, 4)}
    finance = {out[i].affinity_ppm for i in (2, 3)}
    assert min(sports) > max(finance)
    # Feature counts: 6 tokens -> 5 bigrams.
    assert out[0].n_feats == 5


def test_semantic_dedup_keep_first_within_cell(spark):
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),      # identical to 0 -> dup_of 0
        (2, [1.0, 0.01, 0.0, 0.0]),     # cos ~0.99995 to 0 -> dup_of 0
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, n_centroids=2, lloyd_rounds=1, threshold=0.95
        ).collect()
    }
    assert out[0].kept and out[0].dup_of is None
    assert out[3].kept and out[3].dup_of is None
    assert not out[1].kept and out[1].dup_of == 0
    assert not out[2].kept and out[2].dup_of == 0


def test_semantic_dedup_hier_single_coarse_group_equals_flat(spark):
    """With coarse_cells=1 every fine cell sits in the single coarse
    group, so the two-level assignment degenerates to the exact flat
    assignment — output must equal semantic_dedup bit-for-bit (the same
    equality discipline as the derived-vs-fixed LSH sizing pins)."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_hier,
    )

    rows = [
        (i, [float((i * 7 + d * 3) % 11) / 11.0 + 0.1 for d in range(4)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flat = sorted(
        semantic_dedup(
            df, n_centroids=4, lloyd_rounds=0, threshold=0.999
        ).collect()
    )
    hier = sorted(
        semantic_dedup_hier(
            df, n_centroids=4, coarse_cells=1, threshold=0.999
        ).collect()
    )
    assert hier == flat


def test_semantic_dedup_hier_keep_first_exact_within_realized_cells(spark):
    """The hierarchy may place a vector in a coarser cell than the flat
    assignment (the documented recall trade) — but whatever cells it
    realizes, kept/dup_of must be EXACT keep-first within them. Verified
    against a brute-force Python recompute over the returned cells."""
    import math

    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup_hier,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    vec = dict(rows)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup_hier(
            df, n_centroids=4, coarse_cells=2, threshold=0.95
        ).collect()
    }
    assert len(out) == len(rows)  # assignment is a function, no fan-out

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for i, r in out.items():
        witnesses = [
            j
            for j, rj in out.items()
            if j < i and rj.cell == r.cell and cos(vec[j], vec[i]) >= 0.95
        ]
        if witnesses:
            assert not r.kept and r.dup_of == min(witnesses)
        else:
            assert r.kept and r.dup_of is None


def test_semantic_dedup_hier_witness_is_witness_not_keeper(spark):
    """dup_of is the smallest lower-id near-duplicate WITNESS, not
    necessarily a kept row (documented semantics, ADVICE r9): chain
    a~b, b~c with a~c below threshold leaves c pointing at dropped b."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
    )

    # unit vectors at angles 0, 20 and 40 degrees: cos(20deg)~0.94 >= 0.9
    # for adjacent pairs, cos(40deg)~0.766 < 0.9 for the far pair
    import math

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    df = spark.createDataFrame(
        [(0, at(0.0)), (1, at(20.0)), (2, at(40.0))],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, n_centroids=1, lloyd_rounds=0, threshold=0.9
        ).collect()
    }
    assert out[0].kept
    assert not out[1].kept and out[1].dup_of == 0
    # 2 is near 1 (dropped) but not near 0: witness is the dropped row
    assert not out[2].kept and out[2].dup_of == 1


def test_kgram_maintenance_policies(spark, sf_dir):
    """Standing-table retention operators (round 11): merge-unique append
    keeps the table exactly the distinct-k-gram set (screening invariant),
    and ttl expiry keeps only the recent-horizon k-grams."""
    from transit_efficiency_analysis_spark.operators.spans import (
        kgram_occurrences,
        kgram_table_ttl,
        new_kgrams_for_append,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]

    standing = spark.createDataFrame([], "kgram long")
    for b in batches:
        standing = standing.unionByName(
            new_kgrams_for_append(b, standing, k=5)
        ).localCheckpoint()
    # unique-append table == one-shot distinct over the full corpus
    full = kgram_occurrences(docs, 5).select("kgram").distinct()
    assert standing.count() == full.count()
    assert standing.distinct().count() == standing.count()
    assert standing.exceptAll(full).count() == 0

    # ttl: only k-grams last seen within the horizon survive
    seen = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "kgram long, last_seen long"
    )
    kept = {r.kgram for r in kgram_table_ttl(seen, current_batch=2, ttl=1).collect()}
    assert kept == {2, 3}
    with pytest.raises(ValueError, match="ttl"):
        kgram_table_ttl(seen, 2, -1)


def test_semantic_dedup_hier_assignment_is_map_only(spark, sf_dir):
    """Round-11 rewrite (VERDICT r10 #8): vector→coarse and vector→fine
    assignment must be a broadcast-array fold, never an n × C row
    fan-out collapsed by a per-vec_id rank window. The only exchanges
    partitioned by vector id allowed in the plan belong to
    _keep_first_in_cells' pairing stage (the dup groupBy + join-back);
    no Window may be PARTITIONED BY the vector id column."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup_hier,
    )
    from transit_efficiency_analysis_spark.plans import (
        count_shuffles,
        physical_plan,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semantic_dedup_hier(e, n_centroids=16, coarse_cells=4)
    plan = physical_plan(out)
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "vec_id" not in line.split("windowspecdefinition")[0] or \
                "row_number() windowspecdefinition(vec_id" not in line, (
                f"assignment regressed to a per-vec_id rank window: {line}"
            )
    assert "windowspecdefinition(vec_id" not in plan, (
        "assignment regressed to a per-vec_id rank window"
    )
    # pairing stage only: the dup-pair groupBy and the keep-first
    # join-back — 2 data-proportional exchanges, not 4
    assert count_shuffles(out) <= 2


from hypothesis import given, settings, strategies as st

_words_st = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=30
)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_words_st, min_size=1, max_size=8))
def test_flag_occurrences_equals_groupby_join_form(spark, texts):
    """The r11 single-exchange window form must equal the
    duplicated_kgrams groupBy + join-back form on arbitrary corpora —
    same is_dup flags and the same canonical (min doc) ids per
    occurrence. A tiny vocabulary forces heavy cross-doc k-gram
    collisions, the regime where the two forms could diverge."""
    from transit_efficiency_analysis_spark.operators.spans import (
        _flag_occurrences,
        duplicated_kgrams,
        kgram_occurrences,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    occ = kgram_occurrences(docs, k=3)
    win = {
        (r.doc_id, r.pos): (r.canonical_id, r.is_dup)
        for r in _flag_occurrences(occ).collect()
    }
    dup = duplicated_kgrams(occ).withColumnRenamed("canonical_id", "_can")
    ref_rows = occ.join(dup, "kgram", "left").collect()
    ref = {}
    mins = {}
    for r in occ.join(
        occ.groupBy("kgram").agg(F.min("doc_id").alias("_mn")), "kgram"
    ).collect():
        mins[(r.doc_id, r.pos)] = r._mn
    for r in ref_rows:
        ref[(r.doc_id, r.pos)] = (
            mins[(r.doc_id, r.pos)],
            r._can is not None,
        )
    assert win == ref


def test_incremental_screen_single_batch_side_exchange(spark):
    """Round 12 (deferred r11 item): the within-batch half of
    spans_against_kgram_set uses the _flag_occurrences window form —
    the batch is exploded ONCE and exchanged ONCE on the kgram (the
    min/max window), with the corpus-membership join reusing that
    partitioning. The pre-r12 duplicated_kgrams+join form consumed the
    batch occurrence subtree twice (a groupBy AND the membership join),
    which shows up as two posexplode generates in the physical plan."""
    from transit_efficiency_analysis_spark.operators.spans import (
        spans_against_kgram_set,
    )

    batch = _corpus(spark)
    kgram_set = spark.createDataFrame([(123456789,)], "kgram long")
    plan = (
        spans_against_kgram_set(batch, kgram_set, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("posexplode") == 1, plan
    kgram_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(kgram" in ln
    ]
    # one for the batch window; at most one more for the standing set's
    # de-dup (none here: a single-row set folds into the aggregate)
    assert 1 <= len(kgram_exchanges) <= 2, plan
