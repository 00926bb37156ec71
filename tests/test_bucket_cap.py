"""Bucket-size cap (operators/buckets.py): subset semantics, determinism,
and the storm-bucket bound that docs/SCALE.md promises."""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.buckets import cap_buckets
from transit_efficiency_analysis_spark.operators.dedup import minhash_lsh_pairs
from transit_efficiency_analysis_spark.operators.similarity import lsh_topk


def _storm_docs(spark, n=40):
    """Every doc shares the boilerplate prefix → corpus-wide shared
    shingles collapse every minhash band bucket into one (the
    gap-interleaved-marker failure mode from tools/bench_scale.py)."""
    rows = [(i, f"terms of service apply to doc number {i} entry") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_buckets_subset_and_bound(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, bucket int"
    )
    capped = cap_buckets(df, ["bucket"], "doc_id", 4)
    rows = capped.collect()
    assert len(rows) == 12  # 3 buckets x cap 4
    got = {(r["doc_id"], r["bucket"]) for r in rows}
    full = {(r["doc_id"], r["bucket"]) for r in df.collect()}
    assert got <= full
    # under-cap buckets pass through untouched
    small = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, bucket int")
    assert sorted(r["doc_id"] for r in cap_buckets(small, ["bucket"], "doc_id", 5).collect()) == [1, 2]
    # deterministic under repartitioning
    again = {
        (r["doc_id"], r["bucket"])
        for r in cap_buckets(df.repartition(7), ["bucket"], "doc_id", 4).collect()
    }
    assert again == got


def test_minhash_capped_pairs_subset_of_uncapped(spark):
    df = _storm_docs(spark)
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text", threshold=0.1).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.1, max_bucket_size=5
        ).collect()
    }
    assert capped <= uncapped
    assert capped  # the sampled bucket still yields pairs
    # the storm bound: each of the 6 band buckets contributes at most
    # C(5,2)=10 candidate pairs
    assert len(capped) <= 6 * 10


def test_lsh_topk_cap_bounds_candidates_keeps_queries(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(0.0, 1.0) for _ in range(8)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # 1 plane over near-colinear positive vectors → 1-2 storm buckets
    full = lsh_topk(df, planes=1, dims=8, k=3).collect()
    capped = lsh_topk(df, planes=1, dims=8, k=3, max_bucket_size=6).collect()
    # queries never dropped by the cap
    assert {r["query_id"] for r in capped} == {r["query_id"] for r in full}
    # at most cap distinct neighbors are served per bucket
    per_bucket_nbrs = {}
    for r in capped:
        per_bucket_nbrs.setdefault(r["bucket"], set()).add(r["neighbor_id"])
    assert all(len(v) <= 6 for v in per_bucket_nbrs.values())
    # every capped (query, neighbor) pair is a true same-bucket candidate
    from transit_efficiency_analysis_spark.operators.similarity import (
        lsh_bucket_assignments,
    )

    bucket_of = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucket_assignments(df, planes=1, dims=8).collect()
    }
    for r in capped:
        assert bucket_of[r["neighbor_id"]] == r["bucket"] == bucket_of[r["query_id"]]
