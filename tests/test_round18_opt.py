"""Round-18 optimization pins.

1. ``delays_fused`` (both physical forms) is row-for-row identical to the
   two-view ``compute_delays`` pipeline — the flagship's executed plan
   changed in round 18 and this is the in-repo equivalence witness (the
   DuckDB oracle is the cross-engine one).
2. The ``column_memo`` construction caches return stable expression
   trees: two invocations of a memoized demo produce identical results
   (the memo must never leak state between plans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.delay import compute_delays
from transit_efficiency_analysis_spark.operators.testdata_adapter import (
    delays_fused,
    gtfs_data_view,
    trip_updates_view,
)
from transit_efficiency_analysis_spark.sources.registry import load_table


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_delays_fused_matches_two_view_pipeline(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ref = _rows(
        compute_delays(trip_updates_view(o, li), gtfs_data_view(o, li), sort=False)
    )
    assert len(ref) > 0
    for form in ("join", "group"):
        got = _rows(delays_fused(o, li, sort=False, form=form))
        assert got == ref, f"form={form} diverged from compute_delays"


def test_delays_fused_rejects_unknown_form(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    try:
        delays_fused(o, li, form="nope")
    except ValueError as e:
        assert "form" in str(e)
    else:
        raise AssertionError("unknown form must raise")


def test_memoized_trees_are_stable_across_invocations(spark, sf_dir):
    """Two plans built from the same memoized constant trees must agree
    with each other (construction memo, not result memo)."""
    from transit_efficiency_analysis_spark.operators.dedup import (
        simhash_fingerprints,
    )
    from transit_efficiency_analysis_spark.operators.similarity import lsh_topk

    d = load_table(spark, sf_dir, "documents")
    a = _rows(simhash_fingerprints(d, "doc_id", "text"))
    b = _rows(simhash_fingerprints(d, "doc_id", "text"))
    assert a == b and len(a) > 0

    e = load_table(spark, sf_dir, "embeddings")
    x = _rows(lsh_topk(e, planes=4, dims=64, k=2, bucket_assign="expr"))
    y = _rows(lsh_topk(e, planes=4, dims=64, k=2, bucket_assign="expr"))
    assert x == y and len(x) > 0


def test_memoized_alias_does_not_mutate_cache(spark, sf_dir):
    """Aliasing/operating on a memoized Column must not corrupt the
    cached tree for later callers."""
    from transit_efficiency_analysis_spark.operators.similarity import _vn

    c1 = _vn("embedding")
    _ = c1.alias("renamed")
    _ = c1 + 1
    c2 = _vn("embedding")
    e = load_table(spark, sf_dir, "embeddings")
    r1 = _rows(e.select(c2.alias("n")))
    assert len(r1) > 0
