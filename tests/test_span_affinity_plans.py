"""Plan-shape budgets for the round-9 continuation operators: the
SCALE.md claims for the duplicated-span family and the domain-affinity
scorer must be visible in the physical plan."""

from __future__ import annotations

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.plans import (
    assert_no_python_row_udf,
    assert_read_schema_only,
    physical_plan,
)


def test_dup_spans_plan_prunes_scan_and_never_cartesians(spark, sf_dir):
    df = load_registry()["q_text_dup_spans"].fn(spark, sf_dir)
    plan = physical_plan(df)
    # SCALE.md: shuffles carry k-gram/doc-keyed rows, never a cross
    # product of documents; the scan reads only (doc_id, text).
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert_read_schema_only(df, "documents", {"doc_id", "text"})
    assert_no_python_row_udf(df)


def test_dup_span_removal_no_cartesian_no_python(spark, sf_dir):
    df = load_registry()["q_text_dup_span_removal"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert_read_schema_only(df, "documents", {"doc_id", "text"})
    assert_no_python_row_udf(df)


def test_affinity_ratio_table_broadcasts(spark, sf_dir):
    """The ≤64-row bucket-ratio relation must come back to the feature
    rows as a broadcast, and scoring must stay free of Python UDFs."""
    df = load_registry()["q_corpus_domain_affinity"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert_no_python_row_udf(df)


def test_token_budget_no_global_data_window(spark, sf_dir):
    """The cumulative sum must run per literal-boundary bucket: the plan
    carries a hash exchange on the deterministic ``_pid`` bucket id and a
    Window partitioned on it — never a Window whose partition spec is
    empty over the scored-docs relation (that would serialize 100 TB into
    one task). Since r10 the bucket id is a literal-quantile expression,
    not spark_partition_id over a sampled range exchange (that coupled
    correctness to exchange reuse — ADVICE r9), so the plan must show
    hashpartitioning(_pid...) and no spark_partition_id. The tiny offsets
    window (n_buckets rows) is the only unpartitioned one and is
    identifiable by its _psum input."""
    df = load_registry()["q_corpus_token_budget"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "_pid" in plan
    assert "hashpartitioning(_pid" in plan.lower()
    assert "spark_partition_id" not in plan.lower()
    # every Window line mentioning the data-side cumulative column must
    # carry a non-empty partition spec
    for line in plan.splitlines():
        if "Window" in line and "cum_tokens" in line:
            assert "_pid" in line, f"data window lost its bucket key: {line}"


def test_dup_spans_single_scan_two_exchanges(spark, sf_dir):
    """Round-11 rewrite: the in-corpus dup test is a min/max window over
    the kgram partition (operators/spans.py _flag_occurrences), not a
    groupBy + join-back — so the whole detection plan is ONE scan of the
    documents table and exactly two exchanges (kgram window, doc-keyed
    island window). The old form scanned/exploded the corpus twice and
    added the dup-set aggregation as a third wide stage (measured ~2x
    slower at sf0.1)."""
    from transit_efficiency_analysis_spark.plans import count_shuffles

    df = load_registry()["q_text_dup_spans"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert count_shuffles(df) == 2
    assert plan.count("FileScan") == 1
